package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion-time dedup = batch d10, bit-for-bit: the same
  * documents fed through MemoryStream micro-batches against the static
  * corpus index must produce exactly the batch operator's rows. */
class IngestDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("stream-static join matches batch d10 across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = IngestDedup.corpusIndex(docs.filter($"doc_id" % 10 =!= 0))
      .persist() // static side: computed once, reused every micro-batch
    val arrivals = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val stream = MemoryStream[(Long, String)]
    val flagged = IngestDedup.flagArrivals(
      stream.toDS().toDF("doc_id", "text"), corpus)
    val q = flagged.writeStream.outputMode("update")
      .format("memory").queryName("ingest_dedup").start()

    // two micro-batches — incremental arrival, not one big batch
    val (b1, b2) = arrivals.splitAt(arrivals.size / 2)
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()

    val got = spark.sql(
      "SELECT doc_id, n_tiles, matched_tiles, matched_frac, dup FROM ingest_dedup")
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted

    // batch oracle: the declared d10 operator over the same table
    val want = graft.SparkEntry.queries("d10_incremental_dedup")(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted

    assert(got.nonEmpty && got.exists(_._5), "expected at least one flagged dup")
    assert(got === want)
    q.stop()
  }

  test("an arrival below one tile still gets a verdict row (n_tiles=0, not dup)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = IngestDedup.corpusIndex(docs)
    val stream = MemoryStream[(Long, String)]
    val flagged = IngestDedup.flagArrivals(
      stream.toDS().toDF("doc_id", "text"), corpus)
    val q = flagged.writeStream.outputMode("update")
      .format("memory").queryName("ingest_short").start()
    stream.addData((777L, "too short to tile"), (778L, ""))
    q.processAllAvailable()

    val got = spark.sql(
      "SELECT doc_id, n_tiles, matched_tiles, matched_frac, dup FROM ingest_short")
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted
    assert(got === Vector(
      (777L, 0L, 0L, 0.0, false),
      (778L, 0L, 0L, 0.0, false)))
    q.stop()
  }
}
