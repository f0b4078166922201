package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming verbatim-copy gate: arriving documents measured for contiguous
  * word runs already present in the corpus (d20's span semantics at arrival
  * time). The scenario the sibling gates miss by construction: an arrival
  * that pastes a corpus run into otherwise-fresh text has LOW Jaccard
  * against every corpus doc but a high span_ratio here. */
class IngestSpanDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-span-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mkText(words: Seq[String]): String = words.mkString(" ")
  private val run = (1 to 10).map(i => s"word$i") // a 10-token corpus run

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, mkText(run ++ (1 to 10).map(i => s"ctail$i"))),
      (2L, mkText((1 to 20).map(i => s"other$i")))
    ).toDF("doc_id", "text")
  }

  // 101 = pastes the 10-token corpus run into 10 fresh tokens (the
  // plagiarism case: Jaccard vs doc 1 is 10/30 < 0.7, but HALF the
  // arrival is a verbatim corpus run), 102 = fully fresh, 103 = too
  // short to gram (K=4)
  private def arrivals = Seq(
    (101L, mkText((1 to 5).map(i => s"fresh$i") ++ run ++ (6 to 10).map(i => s"fresh$i"))),
    (102L, mkText((1 to 20).map(i => s"new$i"))),
    (103L, "a b c"))

  private type Verdict = (Long, Long, Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"doc_id", $"n_tokens", $"span_tokens", $"n_spans", $"spandup")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: pasted corpus run flagged with exact span bounds; " +
      "fresh and too-short arrivals report zeros") {
    val grams = IngestSpanDedup.corpusIndex(corpus)
    import spark.implicits._
    val out = IngestSpanDedup.flagBatch(arrivals.toDF("doc_id", "text"), grams)
    val v = verdicts(out)
    // arrival 101: its grams inside positions 5..14 are corpus grams
    // (the 7 grams fully inside the run: starts 5..11), covering tokens
    // 5..14 = 10 tokens in ONE span; boundary grams straddling
    // fresh|run don't exist in the corpus and add nothing
    assert(v.contains((101L, 20L, 10L, 1L, true)), s"got: $v")
    assert(v.contains((102L, 20L, 0L, 0L, false)))
    assert(v.contains((103L, 3L, 0L, 0L, false)))
  }

  test("rewriteBatch: the pasted corpus run is cut and the fresh remainder " +
      "survives; clean and too-short arrivals pass through verbatim") {
    import spark.implicits._
    val grams = IngestSpanDedup.corpusIndex(corpus)
    val out = IngestSpanDedup.rewriteBatch(arrivals.toDF("doc_id", "text"), grams)
      .select($"doc_id", $"n_tokens", $"kept_tokens", $"cut_tokens", $"text_dedup")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // arrival 101: tokens 5..14 (the pasted run) cut, fresh halves kept
    assert(out(101L) == ((101L, 20L, 10L, 10L,
      mkText((1 to 5).map(i => s"fresh$i") ++ (6 to 10).map(i => s"fresh$i")))))
    // fully fresh and too-short arrivals: nothing cut, text reconstructed
    assert(out(102L) == ((102L, 20L, 20L, 0L, mkText((1 to 20).map(i => s"new$i")))))
    assert(out(103L) == ((103L, 3L, 3L, 0L, "a b c")))
    // parity with batch d23's cut rule: the rewrite's cut coverage equals
    // flagBatch's span coverage (same grams, same K, same union)
    val flags = IngestSpanDedup.flagBatch(arrivals.toDF("doc_id", "text"), grams)
      .select($"doc_id", $"span_tokens").as[(Long, Long)].collect().toMap
    out.values.foreach { case (id, _, _, cut, _) =>
      assert(cut == flags(id), s"doc $id: cut $cut != flagged span ${flags(id)}")
    }
  }

  test("low-Jaccard high-span: the near-dup gate passes the arrival the " +
      "span gate catches") {
    import spark.implicits._
    val (bands, shingles, counts) = IngestNearDup.corpusIndex(corpus)
    val near = IngestNearDup.flagBatch(
      arrivals.toDF("doc_id", "text"), bands, shingles, counts)
    val nearFlag = near.filter($"doc_id" === 101L)
      .select($"neardup").as[Boolean].head()
    assert(!nearFlag, "arrival 101 must NOT be a >=0.7-Jaccard near-dup")
    val span = IngestSpanDedup.flagBatch(
      arrivals.toDF("doc_id", "text"), IngestSpanDedup.corpusIndex(corpus))
    val spanFlag = span.filter($"doc_id" === 101L)
      .select($"spandup").as[Boolean].head()
    assert(spanFlag, "arrival 101 IS half-verbatim and must trip the span gate")
  }

  test("composed pipeline with the span stage: span_dup verdict for the " +
      "paste arrival, stage order preserved for the others") {
    import spark.implicits._
    val sides = IngestPipeline.corpusIndex(corpus).withSpanGate(corpus).persist()
    try {
      // make every arrival long/clean enough to pass quality (entropy of
      // wordN-style tokens is fine, lengths >= 10 tokens)
      val out = IngestPipeline.gateBatch(arrivals.toDF("doc_id", "text"), sides)
      val v = out.select($"doc_id", $"verdict")
        .as[(Long, String)].collect().toMap
      assert(v(101L) == "span_dup", s"got: $v")
      assert(v(102L) == "accepted")
      assert(v(103L) == "rejected_quality") // 3 tokens < minTokens
      // the span columns surface in the verdict frame
      val spanCols = Set("span_tokens", "n_spans", "span_ratio", "spandup")
      assert(spanCols.subsetOf(out.columns.toSet))
    } finally sides.unpersist()
  }

  test("stream over micro-batches == one-shot batch; every arrival gets a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val grams = IngestSpanDedup.corpusIndex(corpus).persist()
    try {
      val stream = MemoryStream[(Long, String)]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestSpanDedup.start(
        stream.toDS().toDF("doc_id", "text"), grams,
        java.nio.file.Files.createTempDirectory("span-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(arrivals.take(1))
      q.processAllAvailable()
      stream.addData(arrivals.drop(1))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestSpanDedup.flagBatch(
        arrivals.toDF("doc_id", "text"), grams))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L))
    } finally grams.unpersist()
  }
}
