package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Locks the native `session_window` semantics e21 relies on:
  *
  *  1. the merge boundary is CLOSED — an event exactly `gap` after the
  *     previous one still MERGES (the [t, t+gap] windows touch, and
  *     touching sessions merge); only `diff > gap` splits. The Spark docs
  *     don't pin this, so the boundary is asserted here with exact-
  *     microsecond fixtures — e21's DuckDB oracle uses the matching
  *     `diff > gap` island rule (the same rule as e02's hand-rolled
  *     sessionizer). A Spark upgrade that moves the boundary fails this
  *     named test, not an anonymous oracle hash;
  *  2. the batch expression is the SAME operator under Structured
  *     Streaming: a watermarked file-stream run over the real `events`
  *     table emits, for every session it closes, exactly the batch
  *     aggregation's row;
  *  3. a session whose events SPAN micro-batches is MERGED in state, not
  *     emitted as two fragments — the stateful session-merge path,
  *     exercised with a crafted two-batch fixture.
  */
class SessionWindowStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("session-window-state-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val GAP_US = 15L * 60 * 1000 * 1000

  test("merge boundary is closed: diff == gap merges, gap + 1us splits") {
    import spark.implicits._
    val t0 = 1700000000000000L // epoch micros
    val rows = Seq(
      (1L, t0), (1L, t0 + GAP_US),         // exact boundary: MERGES
      (2L, t0), (2L, t0 + GAP_US + 1),     // one past the boundary: splits
      (3L, t0), (3L, t0 + GAP_US), (3L, t0 + 2 * GAP_US) // chained boundary merge
    ).toDF("user_id", "us").withColumn("ts", timestamp_micros($"us"))

    val sess = rows
      .groupBy($"user_id", session_window($"ts", "15 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(sess === Set(
      (1L, t0, t0 + 2 * GAP_US, 2L),           // end = last event + gap
      (2L, t0, t0 + GAP_US, 1L),
      (2L, t0 + GAP_US + 1, t0 + 2 * GAP_US + 1, 1L),
      (3L, t0, t0 + 3 * GAP_US, 3L)))
  }

  test("streaming session_window equals batch for closed sessions") {
    import spark.implicits._
    val all = graft.TestTables.events(spark).select("ts", "user_id")

    // two time-ordered files → two micro-batches; the second batch's
    // watermark closes every first-half session
    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = Files.createTempDirectory("swstream")
    val (first, second) = ordered.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = stream
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "15 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n")
      .writeStream.outputMode("append").format("memory").queryName("swparity").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM swparity")
      .as[(Long, Long, Long, Long)].collect().toVector
    assert(streamed.nonEmpty, "no session closed — expected emissions after batch 2")

    val batch = all
      .groupBy($"user_id", session_window($"ts", "15 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    streamed.foreach { r =>
      val b = batch.get((r._1, r._2))
      assert(b.isDefined, s"streamed session $r missing from batch result")
      assert(b.get === r, s"session mismatch: batch=${b.get} stream=$r")
    }
  }

  test("a session spanning micro-batches merges in state (one row, merged extent)") {
    import spark.implicits._
    val t0 = 1700000000000000L
    val mk = (rows: Seq[(Long, Long)]) =>
      rows.toDF("user_id", "us").select($"user_id", timestamp_micros($"us").as("ts"))
    val dir = Files.createTempDirectory("swmerge")
    // batch 1: user 7's session opens (two events 10 min apart)
    mk(Seq((7L, t0), (7L, t0 + 10L * 60 * 1000000)))
      .write.parquet(s"$dir/f0")
    // batch 2: a third event 10 min later EXTENDS the open session, and a
    // far-future row pushes the watermark past the session's end
    mk(Seq((7L, t0 + 20L * 60 * 1000000), (99L, t0 + 10L * 3600 * 1000000)))
      .write.parquet(s"$dir/f1")

    val schema = mk(Seq((0L, t0))).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = stream
      .withWatermark("ts", "1 minute")
      .groupBy($"user_id", session_window($"ts", "15 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n")
      .writeStream.outputMode("append").format("memory").queryName("swmerge").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT * FROM swmerge WHERE user_id = 7")
      .as[(Long, Long, Long, Long)].collect().toVector
    assert(out === Vector((7L, t0, t0 + 35L * 60 * 1000000, 3L)),
      s"expected ONE merged session over both batches, got $out")
  }
}
