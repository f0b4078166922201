package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The per-source quota admission gate: batch-mode parity with the p12-
  * style rank form, stream == batch over real data, and restart-resume
  * through the state store (a quota filled before a crash must stay
  * filled after it). */
class IngestQuotaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-quota-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = graft.TestTables.table(spark, "documents")
    .select(col("doc_id"), col("source"))

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getBoolean(2), r.getLong(3))).toSet

  test("batch mode equals the rank-based batch twin") {
    val got = collectSet(IngestQuota.admit(docs, 8L))
    val want = collectSet(IngestQuota.admitBatch(docs, 8L))
    assert(got.nonEmpty && got == want)
    // quota actually binds on this data: every source has >8 docs
    assert(got.count(_._3) == 20 * 8)
    assert(got.exists(!_._3))
  }

  test("streamed micro-batches admit exactly the batch-order set") {
    import spark.implicits._
    val n = docs.count()
    val ordered = docs.orderBy($"doc_id").collect()
    val dir = Files.createTempDirectory("quota-stream")
    val (first, second) = ordered.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      // one part-file per batch: the file source triggers per FILE, and a
      // multi-part write shreds the doc_id-ordered batches out of order
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), docs.schema)
        .coalesce(1).write.parquet(s"$dir/f$name")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val q = IngestQuota.admit(stream, 8L).writeStream
      .outputMode("append").format("memory").queryName("quota_par").start()
    q.processAllAvailable(); q.stop()
    val got = collectSet(spark.sql(
      "SELECT doc_id, source, admitted, admitted_before FROM quota_par"))
    // the files are doc_id-ordered, so the cross-batch arrival order IS
    // the doc_id order and the stream must reproduce the batch twin
    val want = collectSet(IngestQuota.admitBatch(docs, 8L))
    assert(got == want)
  }

  test("restart resumes the filled counters from the state store") {
    import spark.implicits._
    val dir = Files.createTempDirectory("quota-restart")
    val ckp = s"$dir/ckp"
    // batch 1: sources A (6 docs) and B (2 docs); quota 4
    (1L to 6L).map(i => (i, "A")).toDF("doc_id", "source")
      .union((7L to 8L).map(i => (i, "B")).toDF("doc_id", "source"))
      .coalesce(1).write.parquet(s"$dir/in/f0")
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    // memory sink cannot recover from a checkpoint; the foreachBatch
    // sink (IngestQuota.start) can — collect verdicts driver-side
    def run(): Set[(Long, String, Boolean, Long)] = {
      val buf = collection.mutable.Set.empty[(Long, String, Boolean, Long)]
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
      val q = IngestQuota.start(stream, 4L, ckp)({ (batch, _) =>
        buf ++= collectSet(batch)
      })
      q.processAllAvailable(); q.stop()
      buf.toSet
    }
    val out1 = run()
    assert(out1.count(t => t._2 == "A" && t._3) == 4) // A filled pre-crash
    assert(out1.count(t => t._2 == "B" && t._3) == 2)
    // "crash", then more arrivals: A must stay rejected, B has room for 2
    (9L to 12L).map(i => (i, "A")).toDF("doc_id", "source")
      .union((13L to 16L).map(i => (i, "B")).toDF("doc_id", "source"))
      .coalesce(1).write.parquet(s"$dir/in/f1")
    val out2 = run()
    val newRows = out2 -- out1
    assert(newRows.map(_._1) == (9L to 16L).toSet, s"resume re-emitted: $newRows")
    assert(newRows.count(t => t._2 == "A" && t._3) == 0,
      s"source A admitted past its pre-restart quota: $newRows")
    assert(newRows.count(t => t._2 == "B" && t._3) == 2)
    assert(newRows.filter(t => t._2 == "B" && t._3).map(_._1) == Set(13L, 14L))
  }
}
