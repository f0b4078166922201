package graft

import org.apache.spark.sql.functions._

/** Streaming-STATE executor-loss drill: kills a REAL executor JVM while a
  * micro-batch is being merged into the bucketed snapshot store, and
  * proves the maintained state still equals the batch truth.
  *
  * Why this exists next to [[ExecutorLossDrill]]: that drill covers the
  * ITERATED-QUERY recovery path (reliable checkpoint vs localCheckpoint);
  * this one covers the STATE LAYER — `SnapshotStore.writeNextBuckets` is
  * what every incremental maintainer commits through, and its claim is
  * that a crash or task loss anywhere before the `_COMMIT` rename leaves
  * readers on the previous complete version while Spark's task retry
  * finishes the write on the surviving executor. Under `local-cluster`
  * (separate executor processes) we SIGKILL one
  * `CoarseGrainedExecutorBackend` mid-merge across a multi-batch
  * `CurrentState` run (the bucketed read-pruned MERGE path, 64 buckets
  * with per-user batch slices so the manifest genuinely spans version
  * dirs), then assert:
  *   - the final materialized state equals the one-shot latest-wins truth
  *     over all events (computed in the same session, baseline pass);
  *   - the standalone worker relaunched the executor (a new pid);
  *   - the kill landed INSIDE a merge (otherwise the drill is vacuous
  *     and exits non-zero — rerun it).
  *
  * Run (after `sbt package`):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_JARS=target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar \
  *   sbt -batch "runMain graft.StreamStateLossDrill"
  * }}}
  * Emits one JSON line and `DRILL_stream_state_loss.json`.
  */
object StreamStateLossDrill {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,2048]")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DRILL_BATCHES", "12").toInt
    val builder = GraftSession.builder(16)
      .master(master)
      .appName("stream-state-loss-drill")
      .config("spark.ui.enabled", "false")
      // 64 buckets over sf0.01's 150 users: a per-user-sliced batch
      // touches ~a tenth of the buckets, so the final manifest genuinely
      // SPANS version dirs (untouched buckets stay in older versions) —
      // the layout the drill is supposed to stress, not a degenerate
      // all-buckets-rewritten-every-batch store
      .config(graft.streaming.SnapshotStore.BucketsConfKey, "64")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("value"))

    // baseline truth: the one-shot latest-wins state (same tie-break the
    // materializer uses), computed BEFORE any kill — also warms JIT and
    // registers both executors
    val truth = events
      .withColumn("rn", expr(
        "row_number() over (partition by user_id order by us desc, event_id desc)"))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(_.toString).sorted

    val appId = spark.sparkContext.applicationId
    def executorPids(): Seq[ProcessHandle] = DrillKit.executorPids(appId)
    val before = executorPids().map(_.pid()).toSet

    // the killer waits for a mid-run stage, then SIGKILLs one executor —
    // armed right before the batch loop so the kill lands inside a merge
    @volatile var killedPid = -1L
    @volatile var killedAtNs = -1L
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveStageIds.isEmpty) Thread.sleep(5)
      Thread.sleep(100) // let the merge's write tasks land on both executors
      executorPids().headOption.foreach { h =>
        killedPid = h.pid()
        h.destroyForcibly()
        killedAtNs = System.nanoTime()
      }
    }, "executor-killer")
    killer.setDaemon(true)

    val stateRoot = java.nio.file.Files.createTempDirectory("drill-state").toString
    val t0 = System.nanoTime()
    killer.start()
    var killBatch = -1
    (0 until nBatches).foreach { i =>
      val s = System.nanoTime()
      // slice by USER so each batch touches a small bucket subset — the
      // merge is latest-wins per key, so per-user slicing converges to
      // the same state as any other split
      graft.streaming.CurrentState.merge(
        events.filter(pmod(col("user_id"), lit(nBatches.toLong)) === i.toLong),
        stateRoot)
      if (killedAtNs >= s && killedAtNs <= System.nanoTime()) killBatch = i
    }
    killer.join(10000)
    val totalMs = (System.nanoTime() - t0) / 1000000L

    val state = graft.streaming.CurrentState.read(spark, stateRoot).get
      .collect().map(_.toString).sorted
    val relaunched = DrillKit.awaitRelaunch(appId, before)
    val matches = truth.sameElements(state)
    val vacuous = killedPid < 0 || killBatch < 0
    // how many version dirs the manifest spans — evidence the drill ran
    // the BUCKETED path, not a degenerate single-version store
    val liveVersions = graft.streaming.SnapshotStore.livePaths(stateRoot)
      .map(_.split("/").takeRight(2).head).distinct.size

    val json = s"""{"metric":"stream_state_loss_drill","sf":"$sfDir",""" +
      s""""master":"$master","batches":$nBatches,"killed_pid":$killedPid,""" +
      s""""kill_batch":$killBatch,"total_ms":$totalMs,"rows":${state.length},""" +
      s""""manifest_spans_versions":$liveVersions,""" +
      s""""state_matches_truth":$matches,"executor_relaunched":$relaunched,""" +
      s""""vacuous":$vacuous,"store":"bucketed read-pruned (64 buckets)"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("DRILL_stream_state_loss.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    // the drill's documented claims are ALL gated: exact state, a kill
    // that landed inside a merge, AND a recovered fleet
    if (!matches || vacuous || !relaunched) sys.exit(1)
  }
}
