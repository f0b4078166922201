package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming MinHash-LSH near-dup gate: arriving documents flagged against
  * the static corpus band index, verified with exact Jaccard (d03's
  * contract), verdicts identical whether docs arrive in one batch or many. */
class IngestNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-neardup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mkText(words: Seq[String]): String = words.mkString(" ")
  private val base = (1 to 40).map(i => s"word$i")

  // corpus: doc 1 = base text, doc 2 = unrelated
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, mkText(base)),
      (2L, mkText((1 to 40).map(i => s"other$i")))
    ).toDF("doc_id", "text")
  }

  // arrivals: 101 = near-copy of corpus doc 1 (one word changed),
  // 102 = unrelated, 103 = too short to shingle
  private def arrivals = Seq(
    (101L, mkText(base.updated(20, "CHANGED"))),
    (102L, mkText((1 to 40).map(i => s"fresh$i"))),
    (103L, "hi"))

  private type Verdict = (Long, Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"doc_id", $"n_candidates", $"n_neardups", $"neardup")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: near-copy verified, unrelated and unshingleable pass") {
    val (bands, shingles, counts) = IngestNearDup.corpusIndex(corpus)
    import spark.implicits._
    val out = IngestNearDup.flagBatch(
      arrivals.toDF("doc_id", "text"), bands, shingles, counts)
    val v = verdicts(out)
    assert(v.exists { case (id, cand, dups, flag) =>
      id == 101L && cand >= 1L && dups == 1L && flag
    }, s"near-copy must be flagged: $v")
    assert(v.contains((102L, 0L, 0L, false)))
    assert(v.contains((103L, 0L, 0L, false)))
    // the verified match names the corpus doc
    val first = out.filter($"doc_id" === 101L)
      .select($"first_neardup").as[Long].head()
    assert(first == 1L)
  }

  test("band collision below the Jaccard bar does NOT flag (verify gate)") {
    import spark.implicits._
    // identical first half (shares many shingles and likely a band),
    // completely different second half → Jaccard ≈ 1/3 < 0.7
    val half = base.take(20)
    val c = Seq((1L, mkText(half ++ (1 to 20).map(i => s"tailA$i")))).toDF("doc_id", "text")
    val (bands, shingles, counts) = IngestNearDup.corpusIndex(c)
    val out = IngestNearDup.flagBatch(
      Seq((201L, mkText(half ++ (1 to 20).map(i => s"tailB$i")))).toDF("doc_id", "text"),
      bands, shingles, counts)
    val row = out.select($"n_neardups", $"neardup")
      .as[(Long, Boolean)].head()
    assert(row == ((0L, false)), "low-Jaccard collision must fail the exact verify")
  }

  test("stream over micro-batches == one-shot batch; every arrival gets a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val (bands0, shingles0, counts0) = IngestNearDup.corpusIndex(corpus)
    val bands = bands0.persist(); val shingles = shingles0.persist()
    val counts = counts0.persist()
    try {
      val stream = MemoryStream[(Long, String)]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestNearDup.start(
        stream.toDS().toDF("doc_id", "text"), bands, shingles, counts,
        java.nio.file.Files.createTempDirectory("neardup-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(arrivals.take(1))
      q.processAllAvailable()
      stream.addData(arrivals.drop(1))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestNearDup.flagBatch(
        arrivals.toDF("doc_id", "text"), bands, shingles, counts))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L))
    } finally { bands.unpersist(); shingles.unpersist(); counts.unpersist() }
  }
}
