package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion-time quality gate = the batch gate, bit-for-bit:
  * the same documents fed through MemoryStream micro-batches must keep
  * exactly the rows the batch filter keeps, with identical scores —
  * including the native char_entropy kernel running inside streaming
  * codegen. */
class IngestQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-quality-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("streaming gate matches the batch gate across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // corpus docs plus crafted pathological arrivals the gate must drop:
    // key-mash (near-zero entropy), an encoded blob (too-high entropy +
    // no tokens), a near-empty page, and a single-word repeat (zero
    // lexical diversity)
    val junk = Seq(
      (900001L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (900002L, "k9!#q@Zx%7&TbW^2mN*4vC(8)pL_=dF+gH-jR~5sY[0]eU{1}iO<3>aP;6/wQ,B.M|"),
      (900003L, "ok"),
      (900004L, ("dup " * 40).trim))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .union(junk.toDF("doc_id", "text"))
    val rows = docs.as[(Long, String)].collect().toSeq

    val stream = MemoryStream[(Long, String)]
    val gated = IngestQuality.gate(stream.toDS().toDF("doc_id", "text"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("ingest_quality").start()

    val (b1, b2) = rows.splitAt(rows.size / 2)
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()

    val got = spark.sql(
      "SELECT doc_id, entropy, n_tokens, distinct_ratio FROM ingest_quality")
      .as[(Long, Double, Long, Double)].collect().toVector.sorted
    val want = IngestQuality.gate(docs)
      .selectExpr("doc_id", "entropy", "n_tokens", "distinct_ratio")
      .as[(Long, Double, Long, Double)].collect().toVector.sorted

    assert(got === want)
    assert(got.nonEmpty, "gate kept nothing — thresholds exclude the whole corpus")
    val keptIds = got.map(_._1).toSet
    assert(junk.forall(j => !keptIds.contains(j._1)),
      s"gate passed pathological docs: ${junk.map(_._1).filter(keptIds)}")
    q.stop()
  }

  test("the gate adds no shuffle to the stream (stateless narrow plan)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val plan = IngestQuality.gate(docs).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, plan.toString)
  }
}
