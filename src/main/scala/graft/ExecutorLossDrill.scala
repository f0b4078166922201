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
    // p16 BFS: diameter-many iterations, each routed through materialize —
    // the longest-running iterated consumer of the reliable seam
    val query = sys.env.getOrElse("SPARK_GRAFT_DRILL_QUERY", "p16_dup_graph_bfs")
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

    // scope to THIS app's executors (DrillKit: --app-id rides the executor
    // command line) — a machine-wide CoarseGrainedExecutorBackend match
    // could kill a concurrent job's executor and report a recovery never
    // exercised
    val appId = spark.sparkContext.applicationId
    def executorPids(): Seq[ProcessHandle] = DrillKit.executorPids(appId)
    val before = executorPids().map(_.pid()).toSet

    // pass 2: repeat the query until the killer lands its SIGKILL inside
    // a run (a warm run can finish in <300ms — one attempt is a race),
    // then run once more entirely AFTER the kill to prove the session
    // stays healthy, not merely that one job limped through
    @volatile var killedPid = -1L
    @volatile var killedAtNs = -1L
    val t0 = System.nanoTime()
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveStageIds.isEmpty) Thread.sleep(5)
      Thread.sleep(50) // let tasks land on both executors
      executorPids().headOption.foreach { h =>
        killedPid = h.pid()
        h.destroyForcibly()
        killedAtNs = System.nanoTime()
      }
    }, "executor-killer")
    killer.setDaemon(true)
    killer.start()
    var duringRuns = 0
    var duringMatch = true
    var killedMidQuery = false
    while (killedAtNs < 0 && duringRuns < 10) {
      val s = System.nanoTime()
      val got = run()
      duringRuns += 1
      duringMatch &&= baseline.sameElements(got)
      if (killedAtNs >= s && killedAtNs <= System.nanoTime()) killedMidQuery = true
    }
    killer.join(10000)
    val post = run() // a full run strictly after the kill
    val queryMs = (System.nanoTime() - t0) / 1000000L

    // the standalone worker relaunches the dead executor; wait (bounded)
    // for the NEW pid so the drill witnesses the retry path, not just
    // survival of the in-flight job
    val relaunched = DrillKit.awaitRelaunch(appId, before)

    val matches = duringMatch && baseline.sameElements(post)
    // the drill's claim is recovery of an IN-FLIGHT job: a kill landing
    // between runs exercises only the relaunch path, so it fails the drill
    // (rerun it) rather than passing vacuously
    val vacuous = killedPid < 0 || !killedMidQuery
    val json = s"""{"metric":"executor_loss_drill","query":"$query","sf":"$sfDir",""" +
      s""""master":"$master","killed_pid":$killedPid,""" +
      s""""killed_mid_query":$killedMidQuery,"runs_during":$duringRuns,""" +
      s""""total_ms":$queryMs,"rows":${post.length},""" +
      s""""result_matches_baseline":$matches,"executor_relaunched":$relaunched,""" +
      s""""vacuous":$vacuous,"materialization":"reliable checkpoint ($ckpt)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("DRILL_executor_loss.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!matches || vacuous) sys.exit(1)
  }
}
