package graft

import org.apache.spark.sql.functions._

/** IVF-fold executor-loss drill: SIGKILLs a REAL executor JVM while the
  * [[graft.streaming.IncrementalIvf]] maintainer is merging batches with
  * two-tier delta compaction forced hot (`maxDeltaDirs=2` → a fold fires
  * on nearly every batch), then proves the maintained assignment index
  * still equals the batch assignment of all rows, the versioned fold
  * ledger is present (the replay watermark survived), and the delta
  * directory count stayed bounded.
  *
  * Split of proof with IncrementalIvfSpec: the DRIVER-side crash windows
  * (fold-write-then-ledger-publish ordering, the ledger-driven live set,
  * the post-publish garbage sweep, legacy-staging migration) are
  * deterministic and spec-pinned there; what a spec cannot exercise is
  * the EXECUTOR-side half — the fold parquet job (written directly at
  * its final `fold=<seq>.<uuid>` name) and the per-batch delta writes
  * surviving a real process kill via task retry on the surviving
  * executor. That is this drill,
  * the [[StreamStateLossDrill]] pattern applied to the fold path.
  *
  * Run (after `sbt package`):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_JARS=target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar \
  *   sbt -batch "runMain graft.IvfFoldLossDrill"
  * }}}
  * Emits one JSON line and `DRILL_ivf_fold_loss.json`; exits non-zero on
  * a mismatch, a vacuous kill (landed outside the batch loop), no fold
  * completed, or a fleet that never relaunched the executor.
  */
object IvfFoldLossDrill {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,2048]")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DRILL_BATCHES", "16").toInt
    val builder = GraftSession.builder(16)
      .master(master)
      .appName("ivf-fold-loss-drill")
      .config("spark.ui.enabled", "false")
      // fold on nearly every batch so the kill window IS the fold window
      .config(graft.streaming.IncrementalIvf.MaxDeltaDirsKey, "2")
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // frozen quantizer + batch truth (same assignment step the maintainer
    // reuses) — computed BEFORE any kill; warms JIT, registers executors
    val cents = graft.analytics.Similarity.ivfCentroids(spark, sfDir).persist()
    val truth = graft.streaming.IncrementalIvf.deltas(emb, cents)
      .as[(Long, Long)].collect().toSet

    val appId = spark.sparkContext.applicationId
    val before = DrillKit.executorPids(appId).map(_.pid()).toSet

    @volatile var killedPid = -1L
    @volatile var killedAtNs = -1L
    val killer = new Thread(() => {
      val tracker = spark.sparkContext.statusTracker
      while (tracker.getActiveStageIds.isEmpty) Thread.sleep(5)
      Thread.sleep(100) // let the merge/fold tasks land on both executors
      DrillKit.executorPids(appId).headOption.foreach { h =>
        killedPid = h.pid()
        h.destroyForcibly()
        killedAtNs = System.nanoTime()
      }
    }, "executor-killer")
    killer.setDaemon(true)

    val stateRoot = java.nio.file.Files.createTempDirectory("drill-ivf").toString
    val t0 = System.nanoTime()
    killer.start()
    var killBatch = -1
    (0 until nBatches).foreach { i =>
      val s = System.nanoTime()
      graft.streaming.IncrementalIvf.merge(
        emb.filter(pmod(col("vec_id"), lit(nBatches.toLong)) === i.toLong),
        cents, i.toLong, stateRoot)
      if (killedAtNs >= s && killedAtNs <= System.nanoTime()) killBatch = i
    }
    killer.join(10000)
    val totalMs = (System.nanoTime() - t0) / 1000000L

    val maintained = graft.streaming.IncrementalIvf.assignments(spark, stateRoot)
      .select(col("cid"), col("cent_id")).as[(Long, Long)].collect().toSet
    val relaunched = DrillKit.awaitRelaunch(appId, before)
    val matches = maintained == truth
    val vacuous = killedPid < 0 || killBatch < 0
    val names = Option(new java.io.File(s"$stateRoot/assign").listFiles())
      .getOrElse(Array.empty).map(_.getName)
    // raw deltas + ledger-listed fold dirs (final `fold=<seq>.<uuid>`
    // names since the object-store-safe layout; legacy folds were batch=)
    val deltaDirs = names.count(n => n.startsWith("batch=") || n.startsWith("fold="))
    val ledgerFiles = names.count(n =>
      n.startsWith("_folded_through") && !n.endsWith(".tmp"))
    val stagingLeft = names.count(_.startsWith("_fold_v"))
    // documented bound at maxDirs=2: maxDirs + max(2, maxDirs/4) + 2 = 6
    // (the first drill run caught tier-1 starvation at exactly this
    // setting — dirs accreted to 9 — so the bound is load-bearing)
    val bounded = deltaDirs <= 6
    val foldsRan = ledgerFiles >= 1

    val json = s"""{"metric":"ivf_fold_loss_drill","sf":"$sfDir",""" +
      s""""master":"$master","batches":$nBatches,"killed_pid":$killedPid,""" +
      s""""kill_batch":$killBatch,"total_ms":$totalMs,"rows":${maintained.size},""" +
      s""""delta_dirs":$deltaDirs,"ledger_files":$ledgerFiles,""" +
      s""""staging_leftover":$stagingLeft,"folds_ran":$foldsRan,""" +
      s""""dirs_bounded":$bounded,"state_matches_truth":$matches,""" +
      s""""executor_relaunched":$relaunched,"vacuous":$vacuous,""" +
      s""""compaction":"two-tier, maxDeltaDirs=2 (fold on nearly every batch)"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("DRILL_ivf_fold_loss.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!matches || vacuous || !relaunched || !foldsRan || !bounded) sys.exit(1)
  }
}
