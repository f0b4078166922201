package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incremental gap-fill view must equal the batch e27 query after ANY
  * split of the event stream into micro-batches — including out-of-order
  * arrival (later event-time delivered first) and replayed batches — and
  * a batch must only recompute the summary rows of the users it touched. */
class IncrementalGapFillSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-gapfill-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def events: DataFrame =
    graft.Tables.t(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "value")

  /** The batch truth: the e27 QueryDef itself. */
  private def expected: Seq[(Long, Long, Long, Long, Long, Long)] =
    collectView(graft.SparkEntry.queries("e27_hourly_gapfill")(spark, sfDir))

  private def collectView(df: DataFrame): Seq[(Long, Long, Long, Long, Long, Long)] =
    df.select("user_id", "n_hours", "n_observed", "n_carried",
        "max_carry_age", "cents_filled")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  private def freshRoot(): String =
    Files.createTempDirectory("gapfill-state").toString

  test("chronological batches converge to the batch e27 summary") {
    val root = freshRoot()
    val days = events.withColumn("d", expr("unix_micros(ts) div 86400000000"))
    val cuts = days.select("d").distinct().collect().map(_.getLong(0)).sorted
    // Three contiguous event-time slices (≈ the replay of a 30-day stream)
    val groups = cuts.grouped((cuts.length + 2) / 3).toSeq
    groups.zipWithIndex.foreach { case (ds, i) =>
      IncrementalGapFill.merge(
        days.filter(col("d").isin(ds: _*)).drop("d"), i.toLong, root)
    }
    assert(collectView(IncrementalGapFill.view(spark, root).get) === expected)
  }

  test("out-of-order arrival (latest slice first) converges identically") {
    val root = freshRoot()
    val h3 = events.withColumn("g", pmod(col("event_id"), lit(3L)))
    // event_id mod 3 interleaves event-time arbitrarily; deliver 2,0,1
    Seq(2L, 0L, 1L).zipWithIndex.foreach { case (g, i) =>
      IncrementalGapFill.merge(
        h3.filter(col("g") === g).drop("g"), i.toLong, root)
    }
    assert(collectView(IncrementalGapFill.view(spark, root).get) === expected)
  }

  test("replayed batch id is a no-op; re-delivered rows are idempotent") {
    val root = freshRoot()
    IncrementalGapFill.merge(events, 0L, root)
    val v1 = collectView(IncrementalGapFill.view(spark, root).get)
    // foreachBatch replay: same batch id → skipped entirely
    IncrementalGapFill.merge(events, 0L, root)
    assert(collectView(IncrementalGapFill.view(spark, root).get) === v1)
    // recovered-batch path: same ROWS under a fresh id → greater-ord merge
    // is idempotent, view unchanged
    IncrementalGapFill.merge(events, 1L, root)
    assert(collectView(IncrementalGapFill.view(spark, root).get) === v1)
    assert(v1 === expected)
  }

  test("real streaming query: events through readStream/foreachBatch " +
      "produce the batch e27 summary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Option[Double] keeps the round-trip null-safe: null-valued events
    // are a supported input (the non-observation contract below), and a
    // primitive getDouble would throw on them if the fixture ever grows
    // organic nulls
    val rows = events
      .select($"user_id", $"ts", $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) Option.empty[Double] else Some(r.getDouble(3))))
      .toSeq
    val root = freshRoot()
    val ckp = Files.createTempDirectory("gapfill-ckp").toString
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, Option[Double])]
    val q = IncrementalGapFill.start(
      stream.toDS().toDF("user_id", "ts", "event_id", "value"), root, ckp)
    val (h, t) = rows.splitAt(rows.size / 2)
    stream.addData(h)
    q.processAllAvailable()
    stream.addData(t)
    q.processAllAvailable()
    q.stop()
    assert(collectView(IncrementalGapFill.view(spark, root).get) === expected)
  }

  test("NULL-valued events are not observations: they neither open a " +
      "carry span nor count as observed, in the batch query and the twin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gapfill-null").toString
    val base = 1700000000000L
    def ts(hours: Int, min: Int) =
      new java.sql.Timestamp(base + hours * 3600000L + min * 60000L)
    val rows = Seq(
      (7L, ts(0, 10), 1L, Option(1.0)),
      (7L, ts(1, 10), 2L, Option.empty[Double]), // NULL: not an observation
      (7L, ts(3, 10), 3L, Option(5.0)))
      .toDF("user_id", "ts", "event_id", "value")
    rows.write.parquet(s"$dir/events.parquet")
    // observed hours +0h (1.0) and +3h (5.0); the null at +1h is ignored:
    // grid [0,3] = 4 hours, 2 observed, carry runs 1.0 through h1,h2
    val want = (7L, 4L, 2L, 2L, 2L, 100L + 100L + 100L + 500L)
    val batch = collectView(
      graft.SparkEntry.queries("e27_hourly_gapfill")(spark, dir))
    assert(batch === Seq(want), "batch query must ignore the null event")
    val root = freshRoot()
    // the null row arrives in its own batch — must be a no-op for state
    val ev = spark.read.parquet(s"$dir/events.parquet")
    IncrementalGapFill.merge(ev.filter($"event_id" === 2L), 0L, root)
    assert(IncrementalGapFill.view(spark, root).get.count() == 0,
      "a batch of only null-valued events observes nothing")
    IncrementalGapFill.merge(ev.filter($"event_id" =!= 2L), 1L, root)
    assert(collectView(IncrementalGapFill.view(spark, root).get) === Seq(want))
  }

  test("non-negative domain guard: pre-epoch timestamps and negative " +
      "event ids are filtered at the source (outside the domain where " +
      "div-vs-floor and struct-vs-printf orderings agree)") {
    import spark.implicits._
    val root = freshRoot()
    val rows = Seq(
      (7L, new java.sql.Timestamp(-3600000L), 1L, Option(9.0)), // pre-epoch
      (7L, new java.sql.Timestamp(1700000000000L), -2L, Option(9.0)), // neg id
      (7L, new java.sql.Timestamp(1700000000000L), 3L, Option(5.0)))
      .toDF("user_id", "ts", "event_id", "value")
    assert(IncrementalGapFill.deltas(rows).count() == 1,
      "only the in-domain event may become an observation")
    IncrementalGapFill.merge(rows, 0L, root)
    val v = IncrementalGapFill.view(spark, root).get.collect()
    assert(v.length == 1 && v.head.getLong(1) == 1L, // n_hours: one observed hour
      "the guarded-out events must not open carry spans")
  }

  test("obs snapshot persisted with the legacy string ord upgrades on " +
      "read: a restart over old state merges instead of crashing") {
    import spark.implicits._
    val root = freshRoot()
    val someUser = events.select(min("user_id")).head().getLong(0)
    // simulate the legacy store: batch 0's obs written with the
    // "%020d%020d" STRING ord (the original layout), view in step
    val d0 = IncrementalGapFill.deltas(events)
    val legacy = d0.withColumn("ord",
      format_string("%020d%020d", $"ord.us", $"ord.eid"))
    SnapshotStore.writeNext(legacy, s"$root/obs", Some(0L))
    SnapshotStore.writeNext(IncrementalGapFill.summarize(d0),
      s"$root/view", Some(0L))
    // upgrade-era batch re-delivers one user's events (idempotent merge
    // against the upgraded snapshot must keep the view exact)
    IncrementalGapFill.merge(
      events.filter(col("user_id") === someUser), 1L, root)
    assert(collectView(IncrementalGapFill.view(spark, root).get) === expected)
  }

  test("crash between the obs and view writes: replaying the batch " +
      "completes the view instead of being gated out (commit order: view " +
      "LAST, so the replay gate must read the VIEW's batch id)") {
    val root = freshRoot()
    val someUser = events.select(min("user_id")).head().getLong(0)
    IncrementalGapFill.merge(events.filter(col("user_id") =!= someUser), 0L, root)
    // simulate the torn batch-1 commit: obs committed at batch 1, then the
    // driver dies before the view write
    val d = IncrementalGapFill.deltas(events.filter(col("user_id") === someUser))
    val obs = IncrementalGapFill.mergedObs(
      SnapshotStore.read(spark, s"$root/obs"), d)
    SnapshotStore.writeNext(obs, s"$root/obs", Some(1L))
    // restart: foreachBatch replays batch 1 — the merge must run (the obs
    // re-merge is idempotent) and produce the missing view update
    IncrementalGapFill.merge(events.filter(col("user_id") === someUser), 1L, root)
    assert(collectView(IncrementalGapFill.view(spark, root).get) === expected,
      "the replayed batch must rebuild the view for its touched users")
  }

  test("a batch touching one user rewrites only that user's summary row") {
    val root = freshRoot()
    val someUser = events.select(min("user_id")).head().getLong(0)
    IncrementalGapFill.merge(events.filter(col("user_id") =!= someUser), 0L, root)
    val before = collectView(IncrementalGapFill.view(spark, root).get)
    IncrementalGapFill.merge(events.filter(col("user_id") === someUser), 1L, root)
    val after = collectView(IncrementalGapFill.view(spark, root).get)
    assert(after.filterNot(_._1 == someUser) === before.filterNot(_._1 == someUser),
      "untouched users' rows must be byte-identical")
    assert(after === expected)
  }
}
