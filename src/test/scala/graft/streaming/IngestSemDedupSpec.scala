package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming semantic near-dup gate: arriving embeddings flagged against
  * the static corpus band index, verified with exact integer cosine
  * (s02's contract), verdicts identical whether vectors arrive in one
  * batch or many. */
class IngestSemDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-semdedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val DIMS = 64
  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(DIMS)(rnd.nextFloat() * 2f - 1f)
  }
  /** Small perturbation: cosine to the original stays ≈ 1. */
  private def nearCopy(v: Array[Float]): Array[Float] =
    v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }

  // corpus ids 1..20; arrival 101 = exact copy of corpus 7, 102 = near-copy
  // of corpus 3, 103 = fresh random vector
  private def corpus = {
    import spark.implicits._
    (1 to 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
  }
  private def arrivals = Seq(
    (101L, vec(7)),
    (102L, nearCopy(vec(3))),
    (103L, vec(999)))

  private type Verdict = (Long, Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"vec_id", $"n_candidates", $"n_semdups", $"semdup")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: exact copy and near-copy verified, fresh vector passes") {
    import spark.implicits._
    val idx = IngestSemDedup.corpusIndex(corpus)
    val out = IngestSemDedup.flagBatch(arrivals.toDF("vec_id", "embedding"), idx)
    val v = verdicts(out)
    assert(v.exists { case (id, cand, dups, flag) =>
      id == 101L && cand >= 1L && dups >= 1L && flag
    }, s"exact copy must be flagged: $v")
    assert(v.exists { case (id, _, dups, flag) =>
      id == 102L && dups >= 1L && flag
    }, s"near-copy must be flagged: $v")
    assert(v.exists { case (id, _, dups, flag) =>
      id == 103L && dups == 0L && !flag
    }, s"fresh vector must pass: $v")
    val firsts = out.filter($"semdup")
      .select($"vec_id", $"first_semdup").as[(Long, Long)].collect().toMap
    assert(firsts(101L) == 7L && firsts(102L) == 3L,
      s"verified match must name the corpus vector: $firsts")
  }

  test("band collision below the cosine bar does NOT flag (verify gate)") {
    import spark.implicits._
    // corpus of ONE vector; arrival = its negation with the band keys
    // forced equal is hard to construct, so instead: lower minCos to admit
    // and raise it to reject the SAME candidate — proving the cosine
    // verify (not band luck) decides the verdict
    val idx = IngestSemDedup.corpusIndex(
      Seq((1L, vec(5))).toDF("vec_id", "embedding"))
    val arrival = Seq((201L, nearCopy(vec(5)))).toDF("vec_id", "embedding")
    val loose = verdicts(IngestSemDedup.flagBatch(arrival, idx, minCos = 0.5))
    val strict = verdicts(IngestSemDedup.flagBatch(arrival, idx, minCos = 1.1))
    assert(loose.exists { case (_, cand, dups, flag) => cand >= 1L && dups >= 1L && flag })
    assert(strict.exists { case (_, cand, dups, flag) => cand >= 1L && dups == 0L && !flag },
      s"candidates must fail the verify at an unreachable bar: $strict")
  }

  test("stream over micro-batches == one-shot batch; every arrival gets a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = IngestSemDedup.corpusIndex(corpus).persist()
    try {
      val stream = MemoryStream[(Long, Array[Float])]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestSemDedup.start(
        stream.toDS().toDF("vec_id", "embedding"), idx,
        java.nio.file.Files.createTempDirectory("semdedup-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(arrivals.take(1))
      q.processAllAvailable()
      stream.addData(arrivals.drop(1))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestSemDedup.flagBatch(
        arrivals.toDF("vec_id", "embedding"), idx))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L))
    } finally { idx.unpersist() }
  }
}
