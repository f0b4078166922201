package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion-time chunk-level dedup = batch t26's chunk semantics at
  * arrival time: the SAME chunk definition (TextOps.chunkStructs), a
  * stream-static probe of the corpus chunk index, micro-batched equal to
  * one-shot, and the alignment contract (exact copy → every chunk dup;
  * appended tail → all but the boundary window; fresh text → none). */
class IngestChunkDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-chunk-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("streaming micro-batches == one-shot batch; exact copy flags every " +
      "chunk; appended tail spares only the boundary window; fresh passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // union a synthetic 200-token donor into the corpus so the arrival
    // spans SEVERAL chunks (ci 0..3: three full 64-token windows + a
    // 56-token boundary window) — the sf0.001 texts are ~60 tokens each
    // and would exercise only the single-chunk case
    val donorText = (1 to 200).map(i => s"donor$i").mkString(" ")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusDocs = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", $"text")
      .unionByName(Seq((800001L, donorText)).toDF("doc_id", "text"))
    val corpus = IngestChunkDedup.corpusIndex(corpusDocs).persist()

    val fresh = (1 to 120).map(i => s"novel$i").mkString(" ")
    val arrivals = Seq(
      (900001L, donorText),                      // exact copy: 4/4 chunks
      // appended tail: n 200->208, so windows 0..2 (full 64-token grids)
      // still match and only the boundary window's hash moves
      (900002L, donorText + " " + (1 to 8).map(i => s"tail$i").mkString(" ")),
      (900003L, fresh))                          // fresh: 0 matches

    // one-shot batch form
    val batch = IngestChunkDedup.flagArrivals(
      arrivals.toDF("doc_id", "text"), corpus)
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted

    // streaming form, two micro-batches
    val stream = MemoryStream[(Long, String)]
    val q = IngestChunkDedup.flagArrivals(
        stream.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("update").format("memory")
      .queryName("ingest_chunk_dedup").start()
    stream.addData(arrivals.take(1): _*)
    q.processAllAvailable()
    stream.addData(arrivals.drop(1): _*)
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT doc_id, n_chunks, dup_chunks, dup_frac, dup FROM ingest_chunk_dedup")
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted
    q.stop()
    assert(got === batch, "micro-batched != one-shot")

    val byId = got.map(r => r._1 -> r).toMap
    val exact = byId(900001L)
    assert(exact._2 === 4L && exact._3 === 4L && exact._5,
      s"exact copy must flag every chunk: $exact")
    val tailed = byId(900002L)
    // the appended tail changes n, so exactly the boundary window's hash
    // moves off the corpus grid; the three full 64-token windows match
    assert(tailed._2 === 4L && tailed._3 === 3L && tailed._5,
      s"tail-append must keep all but the boundary window: $tailed")
    val freshR = byId(900003L)
    assert(freshR._3 === 0L && !freshR._5, s"fresh text must pass: $freshR")
  }

  test("chunk gate == t26's chunk definition: arrival windows recompute " +
      "bit-for-bit against the corpus index built from the same helper") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusDocs = docs.filter($"doc_id" % 10 =!= 0)
    val arrivalDocs = docs.filter($"doc_id" % 10 === 0)
    val corpus = IngestChunkDedup.corpusIndex(corpusDocs)
    val got = IngestChunkDedup.flagArrivals(
        arrivalDocs.select($"doc_id", $"text"), corpus)
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted
    // independent recompute: explode both sides' chunk structs directly
    val aCh = graft.analytics.TextOps.chunkStructs(arrivalDocs)
      .select($"doc_id", explode($"chunks").as("c")).select($"doc_id", $"c.h".as("h"))
    val cCh = graft.analytics.TextOps.chunkStructs(corpusDocs)
      .select(explode($"chunks").as("c")).select($"c.h".as("h")).distinct()
    val want = aCh.join(cCh.withColumn("hit", lit(1L)), Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum(coalesce($"hit", lit(0L))).as("dup_chunks"))
      .withColumn("dup_frac", $"dup_chunks".cast("double") / $"n_chunks")
      .withColumn("dup", $"n_chunks" > 0L && $"dup_frac" >= 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect().toVector.sorted
    // arrivals that tokenize to nothing would differ (explode vs
    // explode_outer) — assert the premise so the equality stays honest
    assert(got.map(_._1).toSet === want.map(_._1).toSet)
    assert(got === want)
  }

  test("an arrival that tokenizes to nothing still gets a verdict row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = IngestChunkDedup.corpusIndex(docs)
    val stream = MemoryStream[(Long, String)]
    val q = IngestChunkDedup.flagArrivals(
        stream.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("update").format("memory")
      .queryName("ingest_chunk_empty").start()
    stream.addData((1L, "!!! ---"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT doc_id, n_chunks, dup FROM ingest_chunk_empty")
      .as[(Long, Long, Boolean)].collect().toVector
    q.stop()
    assert(rows === Vector((1L, 0L, false)))
  }
}
