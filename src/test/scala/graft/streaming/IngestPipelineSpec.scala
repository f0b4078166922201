package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The composed ingest gate: one pass through quality → exact-tile dedup →
  * near-dup must equal the three gates chained independently, and the
  * micro-batched stream must equal the one-shot batch. */
class IngestPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 40 varied words: entropy ~4 bits/char (inside the [3,6] natural-text
  // band), 40 tokens, distinct_ratio 1.0 — passes the quality gate
  private val base = ("quick brown fox jumps over lazy dog bright river stone " +
    "maple winter garden copper violet thunder meadow silver harbor crimson " +
    "velvet orchard lantern whisper granite saffron timber juniper marble " +
    "ember willow falcon prairie cascade boulder zephyr quartz raven tundra " +
    "cobalt").split(" ").toSeq
  private def mk(words: Seq[String]): String = words.mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq((1L, mk(base)),
      (2L, mk((1 to 40).map(i => s"other$i")))).toDF("doc_id", "text")
  }

  // 201 exact copy of corpus doc 1            → exact_dup (tiles align)
  // 202 "zz" prefix shifts every 40-char tile  → near_dup, NOT exact
  //     (tiles misalign ⇒ matched_frac 0; shingles are word-based ⇒
  //      Jaccard ≈ 38/41 ≥ 0.7 and LSH collides)
  // 203 fresh words                            → accepted
  // 204 too short                              → rejected_quality
  private def arrivals = Seq(
    (201L, mk(base)),
    (202L, "zz " + mk(base)),
    (203L, mk((1 to 40).map(i => s"fresh${i}x"))),
    (204L, "hi"))

  private def verdictMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] = {
    import spark.implicits._
    df.select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
  }

  test("single pass assigns the right stage verdict to every arrival") {
    import spark.implicits._
    val sides = IngestPipeline.corpusIndex(corpus).persist()
    try {
      val out = IngestPipeline.gateBatch(arrivals.toDF("doc_id", "text"), sides)
      val v = verdictMap(out)
      assert(v == Map(201L -> "exact_dup", 202L -> "near_dup",
        203L -> "accepted", 204L -> "rejected_quality"), s"verdicts: $v")
      // stage signals are carried: the exact dup shows full tile coverage,
      // the near dup names its corpus match
      val frac = out.filter($"doc_id" === 201L).select($"matched_frac").as[Double].head()
      assert(frac == 1.0)
      val first = out.filter($"doc_id" === 202L).select($"first_neardup").as[Long].head()
      assert(first == 1L)
      // rejected docs never reached the corpus joins: their flags are null
      assert(out.filter($"doc_id" === 204L).select($"exact_dup").head().isNullAt(0))
    } finally sides.unpersist()
  }

  test("chunk stage catches a repeated aligned passage that tiles AND " +
      "MinHash both miss; absent the chunk side the doc is accepted") {
    import spark.implicits._
    // a 200-token donor in the corpus (varied words: quality-band entropy)
    val donorToks = (0 until 200).map(i => s"${base(i % 40)}$i")
    val corpusL = corpus.unionByName(
      Seq((3L, donorToks.mkString(" "))).toDF("doc_id", "text"))
    // the arrival pastes the donor's first 160 tokens COMMA-joined (the
    // punctuation shifts every 40-CHAR tile ⇒ the exact tile gate sees 0
    // matches, but the TOKEN stream — what chunks hash — is unchanged)
    // and appends 48 fresh tokens (shingle Jaccard vs the donor < 0.7 ⇒
    // the near-dup gate passes). Chunk grid: windows 0..2 (tokens 1-64,
    // 49-112, 97-160) match the donor verbatim, window 3 spans the fresh
    // tail — 3/4 dup windows, the repeated-passage signal.
    val pasted = donorToks.take(160).mkString(", ") + " " +
      (0 until 48).map(i => s"fresh${i}zz").mkString(" ")
    val batch = Seq((301L, pasted)).toDF("doc_id", "text")
    val withChunk = IngestPipeline.corpusIndex(corpusL)
      .withChunkGate(corpusL).persist()
    val without = IngestPipeline.corpusIndex(corpusL).persist()
    try {
      val out = IngestPipeline.gateBatch(batch, withChunk)
      assert(verdictMap(out) == Map(301L -> "chunk_dup"),
        s"expected chunk_dup: ${verdictMap(out)}")
      val (nc, dc) = out.filter($"doc_id" === 301L)
        .select($"n_chunks", $"dup_chunks").as[(Long, Long)].head()
      assert(nc == 4L && dc == 3L, s"chunk grid: $nc/$dc")
      // the SAME arrival sails through without the chunk side — the
      // stage is the only gate that sees this failure mode
      assert(verdictMap(IngestPipeline.gateBatch(batch, without))
        == Map(301L -> "accepted"))
      // and the composed stage equals the standalone gate's flag
      val solo = IngestChunkDedup.flagArrivals(batch, withChunk.chunks.get)
        .select($"doc_id", $"dup").as[(Long, Boolean)].head()
      assert(solo == (301L, true))
    } finally { withChunk.unpersist(); without.unpersist() }
  }

  test("single pass == the three gates chained independently") {
    import spark.implicits._
    val sides = IngestPipeline.corpusIndex(corpus).persist()
    try {
      val batch = arrivals.toDF("doc_id", "text")
      val composed = verdictMap(IngestPipeline.gateBatch(batch, sides))
      // chain the singles by hand: quality gate → exact flag → near flag
      val qPass = IngestQuality.gate(batch).select("doc_id", "text")
      val exact = IngestDedup.flagArrivals(qPass, sides.tiles)
      val exactPass = qPass.join(
        exact.filter(!col("dup")).select("doc_id"), Seq("doc_id"), "left_semi")
      val near = IngestNearDup.flagBatch(exactPass,
        sides.bands, sides.shingles, sides.counts)
      val chained =
        batch.select($"doc_id").as[Long].collect().map { id =>
          val q = qPass.filter($"doc_id" === id).count() > 0
          lazy val e = exact.filter($"doc_id" === id && col("dup")).count() > 0
          lazy val n = near.filter($"doc_id" === id && col("neardup")).count() > 0
          id -> (if (!q) "rejected_quality" else if (e) "exact_dup"
                 else if (n) "near_dup" else "accepted")
        }.toMap
      assert(composed == chained, s"composed $composed != chained $chained")
    } finally sides.unpersist()
  }

  test("semantic stage flags embedding near-dups of otherwise-fresh text") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val v1 = vec(); val v2 = vec(); val vOrtho = vec()
    val vectors = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val sides = IngestPipeline.corpusIndex(corpus, vectors).persist()
    try {
      // 205: fresh words (passes every text stage) but corpus-1's embedding
      //      → sem_dup, naming corpus vector 1
      // 206: fresh words, unrelated embedding → accepted
      // 204: too short, carries an embedding — must still die at quality
      val batch = Seq(
        (205L, mk((1 to 40).map(i => s"novel${i}q")), v1),
        (206L, mk((1 to 40).map(i => s"plain${i}w")), vOrtho),
        (204L, "hi", v1)).toDF("doc_id", "text", "embedding")
      val out = IngestPipeline.gateBatch(batch, sides)
      val v = verdictMap(out)
      assert(v == Map(205L -> "sem_dup", 206L -> "accepted",
        204L -> "rejected_quality"), s"verdicts: $v")
      val first = out.filter($"doc_id" === 205L).select($"first_semdup").as[Long].head()
      assert(first == 1L)
      // parity: the composed stage equals IngestSemDedup run by hand on
      // the stage-3 survivors
      val handVecs = Seq((205L, v1), (206L, vOrtho)).toDF("vec_id", "embedding")
      val hand = IngestSemDedup.flagBatch(handVecs, sides.sem.get)
        .select($"vec_id", $"semdup").as[(Long, Boolean)].collect().toMap
      assert(hand == Map(205L -> true, 206L -> false))
      // a batch with no embedding column skips the stage (schema unchanged)
      val noVec = IngestPipeline.gateBatch(
        Seq((207L, mk((1 to 40).map(i => s"clean${i}z")))).toDF("doc_id", "text"), sides)
      assert(!noVec.columns.contains("semdup"))
      assert(verdictMap(noVec) == Map(207L -> "accepted"))
    } finally sides.unpersist()
  }

  test("micro-batched stream == one-shot batch; every arrival gets a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val sides = IngestPipeline.corpusIndex(corpus).persist()
    try {
      val stream = MemoryStream[(Long, String)]
      val got = collection.mutable.Map.empty[Long, String]
      val q = IngestPipeline.start(
        stream.toDS().toDF("doc_id", "text"), sides,
        java.nio.file.Files.createTempDirectory("pipeline-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdictMap(flagged) }
      }
      stream.addData(arrivals.take(2))
      q.processAllAvailable()
      stream.addData(arrivals.drop(2))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdictMap(
        IngestPipeline.gateBatch(arrivals.toDF("doc_id", "text"), sides))
      assert(got.toMap == oneShot, s"micro-batched $got != one-shot $oneShot")
      assert(got.keySet == Set(201L, 202L, 203L, 204L))
    } finally sides.unpersist()
  }
}
