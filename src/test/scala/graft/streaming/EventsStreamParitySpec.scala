package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Batch = stream: the watermarked tumbling-window pipeline over the REAL
  * driver-generated `events` table (file-stream source, two micro-batches)
  * must emit exactly the batch aggregation's rows for every window it
  * closes — the T10 contract on actual data rather than a hand fixture. */
class EventsStreamParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("events-stream-parity-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming tumbling windows equal the batch aggregation for closed windows") {
    import spark.implicits._
    val all = graft.TestTables.events(spark)
      .select("ts", "event_type", "value")

    // two time-ordered files → two micro-batches → the second batch's
    // watermark closes the first batch's windows
    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = Files.createTempDirectory("evstream")
    val (first, second) = ordered.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = EventTimeWindows.tumbling(stream, "1 hour", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("parity").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM parity")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toVector
    assert(streamed.nonEmpty, "no window closed — expected emissions after batch 2")

    val batch = all
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      .select($"w.start", $"event_type", $"n", $"total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    streamed.foreach { r =>
      val b = batch.get((r._1, r._2))
      assert(b.isDefined, s"streamed window ${r._1}/${r._2} missing from batch result")
      assert(b.get._3 == r._3, s"count mismatch for ${r._1}/${r._2}: batch=${b.get} stream=$r")
      // total_value is a DOUBLE sum, and double addition is order-dependent:
      // the batch side folds partials in partition order (which the shared
      // loader's repartition shuffles), the stream side in micro-batch order.
      // The engine's oracle-parity path routes aggregated doubles through
      // DECIMAL for exactly this reason (sqlx.dsum); the streaming aggregate
      // keeps the codegen'd double sum, so parity here is up-to-reassociation.
      val (bv, sv) = (b.get._4, r._4)
      assert(math.abs(bv - sv) <= 1e-9 * math.max(1.0, math.abs(bv)),
        s"value mismatch for ${r._1}/${r._2}: batch=$bv stream=$sv")
    }
  }

  test("stream-stream interval join (attribution) equals the batch join — " +
      "no pair lost to state eviction, no duplicates") {
    import spark.implicits._
    val all = graft.TestTables.events(spark)
      .select("event_id", "ts", "user_id", "event_type")

    // two time-ordered files → the second batch advances the watermark
    // past the first's clicks; nothing arrives late, so eviction can only
    // drop clicks the watermark PROVED unmatchable
    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = Files.createTempDirectory("evattr")
    val (first, second) = ordered.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = EventTimeWindows.attribution(stream)
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT user_id, click_id, purchase_id, gap_us FROM attr")
      .as[(Long, Long, Long, Long)].collect().toVector.sorted
    assert(streamed.nonEmpty, "expected attributed pairs from the real events table")

    val clicks = all.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("c_us"))
    val purchases = all.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        unix_micros($"ts").as("p_us"))
    val batch = clicks.join(purchases,
      $"user_id" === $"p_user" && $"p_us" > $"c_us" &&
        $"p_us" <= $"c_us" + lit(7200L * 1000000L))
      .select($"user_id", $"click_id", $"purchase_id", ($"p_us" - $"c_us").as("gap_us"))
      .as[(Long, Long, Long, Long)].collect().toVector.sorted
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER interval join: matches equal the batch join, " +
      "and the unconverted tail emits null rows exactly for watermark-proven clicks") {
    import spark.implicits._
    val all = graft.TestTables.events(spark)
      .select("event_id", "ts", "user_id", "event_type")

    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = Files.createTempDirectory("evattro")
    val (first, second) = ordered.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = EventTimeWindows.attributionOuter(stream)
      .writeStream.outputMode("append").format("memory").queryName("attro").start()
    q.processAllAvailable()
    // null-row completeness is judged against the watermark the FINAL
    // executed batch actually used (reported in progress) — eviction for
    // events of the last file would need one more batch that never runs
    val wmFinalUs = java.time.Instant.parse(
      q.lastProgress.eventTime.get("watermark")).toEpochMilli * 1000L
    q.stop()

    val streamed = spark.sql(
      "SELECT user_id, click_id, purchase_id, gap_us FROM attro")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toVector

    // 1) the matched side is EXACTLY the batch inner interval join
    val clicks = all.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("c_us"))
    val purchases = all.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        unix_micros($"ts").as("p_us"))
    val batchPairs = clicks.join(purchases,
      $"user_id" === $"p_user" && $"p_us" > $"c_us" &&
        $"p_us" <= $"c_us" + lit(7200L * 1000000L))
      .select($"user_id", $"click_id", $"purchase_id", ($"p_us" - $"c_us").as("gap_us"))
      .as[(Long, Long, Long, Long)].collect().toVector.sorted
    val streamedMatches = streamed.collect {
      case (u, c, Some(p), Some(g)) => (u, c, p, g)
    }.sorted
    assert(streamedMatches == batchPairs)

    // 2) every null row is a genuinely unconverted click — never a click
    //    that HAS an in-window purchase (that would be a premature or
    //    duplicate eviction)
    val converted = batchPairs.map(p => (p._1, p._2)).toSet
    val streamedNulls = streamed.collect { case (u, c, None, None) => (u, c) }
    assert(streamedNulls.distinct.size == streamedNulls.size, "duplicate null rows")
    streamedNulls.foreach { uc =>
      assert(!converted(uc), s"null row emitted for a CONVERTED click $uc")
    }
    assert(streamedNulls.nonEmpty,
      "expected some watermark-proven unconverted clicks on the real events table")

    // 3) completeness up to the watermark: an unconverted click whose
    //    no-match proof point (c_ts + window) lies safely below the last
    //    batch's watermark (1s guard) MUST have emitted its null row
    val proofCut = wmFinalUs - 7200L * 1000000L - 1000000L
    val mustEmit = clicks.as[(Long, Long, Long)].collect()
      .filter { case (u, c, cus) => !converted((u, c)) && cus < proofCut }
      .map { case (u, c, _) => (u, c) }.toSet
    val nullSet = streamedNulls.toSet
    mustEmit.foreach { uc =>
      assert(nullSet(uc), s"watermark-proven unconverted click $uc was never emitted")
    }
  }

  test("streamed per-minute counts + moment dag reproduce the batch e14 " +
      "anomalies bit-for-bit") {
    import spark.implicits._
    val all = graft.TestTables.events(spark)
      .select("ts")

    // three micro-batches: counts for a minute straddling a batch
    // boundary must MERGE in the state store, not overwrite
    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = Files.createTempDirectory("evanom")
    val third = (n / 3).toInt
    Seq("0" -> ordered.slice(0, third), "1" -> ordered.slice(third, 2 * third),
      "2" -> ordered.slice(2 * third, n.toInt)).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = EventTimeWindows.minutelyRate(stream)
      .writeStream.outputMode("complete").format("memory").queryName("rate").start()
    q.processAllAvailable()
    q.stop()

    val streamedAnomalies = EventTimeWindows.rateAnomalies(spark.sql(
      "SELECT minute_us, n FROM rate"))
      .as[(Long, Long, Double)].collect().toVector

    // batch twin: the e14 dag over the same events (same expression tree,
    // so doubles must match BIT-FOR-BIT, not approximately)
    val perMin = all
      .groupBy(unix_micros(date_trunc("minute", $"ts")).as("minute_us"))
      .agg(count(lit(1)).as("n"))
    val batchAnomalies = EventTimeWindows.rateAnomalies(perMin)
      .as[(Long, Long, Double)].collect().toVector

    assert(streamedAnomalies.nonEmpty, "expected anomalies in the events table")
    assert(streamedAnomalies == batchAnomalies)
  }
}
