package graft

/** Shared machinery for the executor-loss drills: pid discovery scoped to
  * ONE application's executor JVMs, and a bounded wait for the standalone
  * worker to relaunch a killed executor. Factored out so a fix to the
  * pid-matching predicate (e.g. the machine-wide-match hazard: an
  * unscoped `CoarseGrainedExecutorBackend` grep could kill a CONCURRENT
  * job's executor and report a recovery never exercised) applies to every
  * drill at once. */
private[graft] object DrillKit {

  /** Live executor processes of THIS app (`--app-id` rides the executor
    * command line under local-cluster/standalone). */
  def executorPids(appId: String): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala.filter { h =>
      val cmd = h.info().commandLine()
      cmd.isPresent && cmd.get.contains("CoarseGrainedExecutorBackend") &&
        cmd.get.contains(appId)
    }.toSeq
  }

  /** Wait (bounded) for a pid NOT in `before` to appear — the worker's
    * relaunch of the killed executor. The drills GATE on this: a run
    * where the fleet never recovered proves survival of one job, not the
    * retry story the artifact claims. */
  def awaitRelaunch(appId: String, before: Set[Long],
      timeoutMs: Long = 15000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var fresh = false
    while (!fresh && System.nanoTime() < deadline) {
      fresh = (executorPids(appId).map(_.pid()).toSet -- before).nonEmpty
      if (!fresh) Thread.sleep(200)
    }
    fresh
  }
}
