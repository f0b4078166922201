package graft

/** Executor-loss drill: kills a REAL executor JVM mid-query and proves the
  * engine completes with correct results anyway.
  *
  * Why this exists: every iterated plan (p03/p15/p16/p21 contractions, BFS
  * levels, t21's vocab loop) materializes between iterations through
  * [[GraftSession.materialize]]. The local path (`localCheckpoint`) stores
  * blocks only on executors — Spark documents that losing one FAILS the
  * job, the classic spot-preemption trap on a 1000-executor cluster. The
  * reliable path (`spark.graft.checkpointDir` → `checkpoint()`) survives
  * any executor loss. `ReliableMaterializeSpec` pins the lineage shape;
  * this drill is the behavioral proof: under `local-cluster` (separate
  * executor processes), SIGKILL one `CoarseGrainedExecutorBackend` while
  * the iterated query is mid-flight, and assert the run still returns the
  * baseline's exact rows.
  *
  * Run (after `sbt package`):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_JARS=target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar \
  *   sbt -batch "runMain graft.ExecutorLossDrill"
  * }}}
  * Emits one JSON line and `DRILL_executor_loss.json`; exits non-zero if
  * the kill missed the query window (vacuous) or the results diverged.
  */
object ExecutorLossDrill {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,2048]")
    val query = sys.env.getOrElse("SPARK_GRAFT_DRILL_QUERY", "p03_dup_clusters")
    val ckpt = java.nio.file.Files.createTempDirectory("drill-ckpt").toString
    val builder = GraftSession.builder(16)
      .master(master)
      .appName("executor-loss-drill")
      .config("spark.ui.enabled", "false")
      .config(GraftSession.CheckpointDirKey, ckpt)
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): Array[String] =
      SparkEntry.queries(query)(spark, sfDir).collect().map(_.toString).sorted

    // pass 1: baseline — correct answer, executors registered, JIT warm
    val baseline = run()

    def executorPids(): Seq[ProcessHandle] = {
      import scala.jdk.CollectionConverters._
      ProcessHandle.allProcesses().iterator().asScala.filter { h =>
        val cmd = h.info().commandLine()
        cmd.isPresent && cmd.get.contains("CoarseGrainedExecutorBackend")
      }.toSeq
    }
    val before = executorPids().map(_.pid()).toSet

    // pass 2: the same query with a killer thread that SIGKILLs one
    // executor as soon as the query's first stage is actively running
    @volatile var killedPid = -1L
    @volatile var killedAtMs = -1L
    val t0 = System.nanoTime()
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveStageIds.isEmpty) Thread.sleep(10)
      Thread.sleep(300) // let tasks land on both executors
      executorPids().headOption.foreach { h =>
        killedPid = h.pid()
        h.destroyForcibly()
        killedAtMs = (System.nanoTime() - t0) / 1000000L
      }
    }, "executor-killer")
    killer.setDaemon(true)
    killer.start()
    val drilled = run()
    val queryMs = (System.nanoTime() - t0) / 1000000L
    killer.join(10000)

    // the standalone worker relaunches the dead executor; record that the
    // fleet recovered (a NEW pid appears) so the drill also witnesses the
    // retry path, not just survival of the in-flight job
    val after = executorPids().map(_.pid()).toSet
    val relaunched = (after -- before).nonEmpty

    val matches = baseline.sameElements(drilled)
    val vacuous = killedPid < 0 || killedAtMs < 0 || killedAtMs >= queryMs
    val json = s"""{"metric":"executor_loss_drill","query":"$query","sf":"$sfDir",""" +
      s""""master":"$master","killed_pid":$killedPid,"killed_at_ms":$killedAtMs,""" +
      s""""query_ms":$queryMs,"rows":${drilled.length},""" +
      s""""result_matches_baseline":$matches,"executor_relaunched":$relaunched,""" +
      s""""vacuous":$vacuous,"materialization":"reliable checkpoint ($ckpt)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("DRILL_executor_loss.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!matches || vacuous) sys.exit(1)
  }
}
