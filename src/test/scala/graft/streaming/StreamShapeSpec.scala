package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The streaming counterpart of analytics.ScaleShapeSpec: locks the
  * per-batch PLAN shapes that keep the streaming operators viable at
  * 100 TB, the way ScaleShapeSpec locks the batch queries' plans.
  *
  *  - the ingest gates (exact tile dedup, near-dup, and the composed
  *    pipeline) contact the corpus ONLY through the persisted index —
  *    never by re-scanning the corpus files per micro-batch;
  *  - the incremental maintainers' per-batch work touches only the batch
  *    and the CURRENT snapshot (one version dir, not the store's history),
  *    with no unpartitioned window anywhere in a merge plan;
  *  - IncrementalTopK's re-rank input is bounded by the batch's touched
  *    keys (a semi-join), never the whole base relation.
  */
class StreamShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("stream-shape-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Root paths of every FILE scan in the optimized plan. Cached subtrees
    * are replaced by InMemoryRelation during optimization, so a persisted
    * index's corpus scan does NOT appear here — which is exactly the
    * property under test. */
  private def fileScanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  private def inMemoryRelations(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case m: InMemoryRelation => m }.size

  /** Assert a merge plan's file scans are EXACTLY the store's current live
    * paths — the manifest-resolved bucket dirs for a bucketed store, the
    * one `v=N` dir for a flat one. Reading anything else (older versions,
    * superseded buckets) would grow per-batch read cost with the store's
    * history; reading less would drop state. */
  private def assertScansLive(df: DataFrame, root: String, what: String): Unit = {
    val live = SnapshotStore.livePaths(root)
    val scans = fileScanPaths(df)
    assert(scans.nonEmpty, s"$what has no file scan — the assertion is vacuous")
    assert(scans.forall(p => live.exists(p.endsWith)),
      s"$what scans beyond the current snapshot's live paths $live, got $scans")
    assert(live.forall(lp => scans.exists(_.endsWith(lp))),
      s"$what misses live paths $live, got $scans")
  }

  test("ingest gates contact the corpus only via the persisted index, never a corpus re-scan") {
    import spark.implicits._
    val corpusDir = java.nio.file.Files.createTempDirectory("shape-corpus").toString
    (1 to 50).map(i => (i.toLong, (1 to 40).map(j => s"w$i-$j").mkString(" ")))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val sides = IngestPipeline.corpusIndex(corpus).persist()
    try {
      // the doc must PASS the quality stage: a failing doc lets the
      // optimizer fold the LocalRelation batch to empty and prune the
      // corpus joins away, making the scan assertions vacuous
      val batch = Seq((900L, ("quick brown fox jumps over lazy dog bright " +
        "river stone maple winter garden copper violet thunder meadow")))
        .toDF("doc_id", "text")
      val plans = Seq(
        "IngestDedup.flagArrivals" ->
          IngestDedup.flagArrivals(batch, sides.tiles),
        "IngestNearDup.flagBatch" ->
          IngestNearDup.flagBatch(batch, sides.bands, sides.shingles, sides.counts),
        "IngestPipeline.gateBatch" ->
          IngestPipeline.gateBatch(batch, sides))
      plans.foreach { case (name, df) =>
        val corpusScans = fileScanPaths(df).filter(_.contains(corpusDir))
        assert(corpusScans.isEmpty,
          s"$name re-scans the corpus files per micro-batch: $corpusScans")
        assert(inMemoryRelations(df) > 0,
          s"$name never touches the persisted corpus index — the test is vacuous")
      }
    } finally sides.unpersist()
    // the lock has teeth: with the cache gone, the same per-batch plan DOES
    // scan the corpus files — so a future edit that drops the persisted
    // seam fails the assertions above rather than silently re-scanning.
    // (This must run after unpersist(): the CacheManager matches by plan
    // EQUALITY, so while the cache lives even a freshly-built index
    // resolves to the InMemoryRelation.)
    val probe = Seq((901L, "quick brown fox jumps over lazy dog bright river stone"))
      .toDF("doc_id", "text")
    val raw = IngestPipeline.corpusIndex(spark.read.parquet(corpusDir))
    val unpersisted = IngestDedup.flagArrivals(probe, raw.tiles)
    assert(fileScanPaths(unpersisted).exists(_.contains(corpusDir)))
  }

  test("IngestSemDedup contacts the corpus only via the persisted band index") {
    import spark.implicits._
    val corpusDir = java.nio.file.Files.createTempDirectory("shape-emb").toString
    val rnd = new scala.util.Random(3)
    (1 to 50).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(corpusDir)
    val idx = IngestSemDedup.corpusIndex(spark.read.parquet(corpusDir)).persist()
    try {
      val batch = Seq((900L, Array.fill(64)(0.5f)))
        .toDF("vec_id", "embedding")
      val df = IngestSemDedup.flagBatch(batch, idx)
      val corpusScans = fileScanPaths(df).filter(_.contains(corpusDir))
      assert(corpusScans.isEmpty,
        s"IngestSemDedup re-scans the corpus embeddings per micro-batch: $corpusScans")
      assert(inMemoryRelations(df) > 0,
        "IngestSemDedup never touches the persisted index — the test is vacuous")
    } finally idx.unpersist()
  }

  test("IngestMediaDedup contacts the corpus only via the persisted " +
      "fingerprint index — payload files are never re-decoded per batch") {
    import spark.implicits._
    val corpusDir = java.nio.file.Files.createTempDirectory("shape-media").toString
    (1 to 8).map(g => (g.toLong,
      graft.analytics.ImageCodec.encodePng(16, 16, (x, y) => (x * y + g) % 256)))
      .toDF("image_id", "payload").write.mode("overwrite").parquet(corpusDir)
    val idx = IngestMediaDedup.corpusIndex(spark.read.parquet(corpusDir)).persist()
    try {
      val batch = Seq((900L,
        graft.analytics.ImageCodec.encodePng(16, 16, (x, y) => (x + y) % 256)))
        .toDF("image_id", "payload")
      // flagPlan is the pure plan flagBatch caches/materializes — the
      // executed flagBatch frame is a localCheckpoint whose lineage is
      // cut, so the shape must be pinned on the plan form
      val df = IngestMediaDedup.flagPlan(batch, idx)
      val corpusScans = fileScanPaths(df).filter(_.contains(corpusDir))
      assert(corpusScans.isEmpty,
        s"IngestMediaDedup re-decodes the corpus payloads per micro-batch: $corpusScans")
      assert(inMemoryRelations(df) > 0,
        "IngestMediaDedup never touches the persisted index — the test is vacuous")
    } finally idx.unpersist()
  }

  test("IncrementalAgg per-batch plan: batch + current snapshot only, one join, no window") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-agg").toString
    def batch(i: Int) = Seq(("i", null: String, null: java.lang.Double, s"g$i",
      java.lang.Double.valueOf(i.toDouble)))
      .toDF("op", "grp_old", "amount_old", "grp_new", "amount_new")
    IncrementalAgg.merge(batch(1), 0L, root)
    IncrementalAgg.merge(batch(2), 1L, root)
    IncrementalAgg.merge(batch(3), 2L, root)
    // the store retains current + fallback (and, bucketed, older versions
    // still hosting live buckets); the merge frame must read ONLY the
    // manifest-resolved live data — a history or corpus scan here would
    // grow per-batch work with the store's age
    val cur = SnapshotStore.read(spark, root)
    val merged = IncrementalAgg.mergedFrame(cur, IncrementalAgg.deltas(batch(4)))
    assertScansLive(merged, root, "IncrementalAgg merge")
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    val joins = merged.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    assert(joins.size == 1, s"expected exactly one snapshot↔delta join, got ${joins.size}")
    assert(merged.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "no window belongs in the delta merge")
    // and the delta reduction itself is one aggregate over the batch alone
    val d = IncrementalAgg.deltas(batch(4))
    assert(fileScanPaths(d).isEmpty, "deltas must not touch any stored state")
  }

  test("CurrentState per-batch plan: partitioned window over batch + current snapshot only") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-state").toString
    def batch(i: Int) = Seq((i.toLong % 3, i.toLong, "click", i.toLong * 10, s"v$i"))
      .toDF("user_id", "event_id", "event_type", "us", "value")
    CurrentState.merge(batch(1), root)
    CurrentState.merge(batch(2), root)
    CurrentState.merge(batch(3), root)
    val cur = CurrentState.read(spark, root)
    val merged = CurrentState.mergedFrame(cur, batch(4))
    assertScansLive(merged, root, "CurrentState merge")
    val windows = merged.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "latest-wins window must be PARTITIONED by the key — an unpartitioned " +
        "window funnels the whole state through one task")
  }

  test("IncrementalGapFill per-batch plans: the obs merge reads batch + " +
      "current snapshot only (one join, no window); the view rebuild is " +
      "touched-users-bounded with PARTITIONED windows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-gapfill").toString
    def batch(i: Int) = Seq((i.toLong % 3, i.toLong,
      new java.sql.Timestamp(1700000000000L + i * 3600000L), i.toDouble))
      .toDF("user_id", "event_id", "ts", "value")
    IncrementalGapFill.merge(batch(1), 0L, root)
    IncrementalGapFill.merge(batch(2), 1L, root)
    IncrementalGapFill.merge(batch(3), 2L, root)
    val obsRoot = s"$root/obs"
    val cur = SnapshotStore.read(spark, obsRoot)
    val merged = IncrementalGapFill.mergedObs(cur, IncrementalGapFill.deltas(batch(4)))
    assertScansLive(merged, obsRoot, "IncrementalGapFill obs merge")
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val joins = merged.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    assert(joins.size == 1, s"expected exactly one snapshot↔delta join, got ${joins.size}")
    assert(merged.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "no window belongs in the obs merge")
    // view rebuild: previous rows survive via an ANTI join on the touched
    // set, the recompute is SEMI-join-bounded to the touched users, and
    // every LOCF window is partitioned by user_id (span-bounded sort)
    val touched = batch(4).select($"user_id").distinct()
    val view = IncrementalGapFill.mergedView(
      SnapshotStore.read(spark, s"$root/view"), cur.get, touched)
    val types = view.queryExecution.optimizedPlan.collect {
      case j: LJoin => j.joinType }
    assert(types.contains(LeftAnti) && types.contains(LeftSemi),
      s"view rebuild must anti-keep untouched rows and semi-bound the recompute, got $types")
    val windows = view.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "LOCF windows must be partitioned by user_id — an unpartitioned " +
        "window funnels the whole grid through one task")
  }

  test("IncrementalComponents relabel: the snapshot joins a BROADCAST of " +
      "the batch-bounded delta — current version only, no corpus shuffle") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-comp").toString
    IncrementalComponents.merge(Seq((1L, 2L), (5L, 6L)).toDF("i", "j"), 0L, root)
    IncrementalComponents.merge(Seq((2L, 5L)).toDF("i", "j"), 1L, root)
    val cur = SnapshotStore.read(spark, root).get
    val delta = Seq((1L, 1L)).toDF("node", "lab")
    val frame = IncrementalComponents.relabeled(cur, delta)
    assertScansLive(frame, root, "IncrementalComponents relabel")
    val bcasts = frame.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bcasts.nonEmpty,
      "the delta must broadcast — a shuffled relabel join re-exchanges the " +
        "whole corpus-sized label snapshot every batch")
    val exchanges = frame.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, s"no shuffle belongs in the relabel: $exchanges")
  }

  test("IncrementalTopK re-rank input is bounded by the touched keys") {
    import spark.implicits._
    val base = (1 to 30).map(i => (s"k${i % 10}", i.toLong, i.toDouble))
      .toDF("key", "id", "score")
    val touched = Seq("k1").toDF("key")
    val reranked = IncrementalTopK.rerank(base, touched, 3)
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val semis = reranked.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.joinType == LeftSemi => j
    }
    assert(semis.nonEmpty,
      "re-rank must semi-join the base down to the touched keys BEFORE ranking")
    // and behaviorally: untouched keys never reach the ranking output
    val keys = reranked.select($"key").distinct().as[String].collect().toSet
    assert(keys == Set("k1"), s"re-rank leaked untouched keys: $keys")
  }
}
