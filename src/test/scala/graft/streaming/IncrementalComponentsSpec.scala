package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incremental component labels must equal the batch contraction
  * (`Curation.contractComponents`) of the union of all delivered edges —
  * after ANY split of the edge stream into batches, in any order,
  * including replays — with the same `(node, lab = component min)` rule
  * every batch consumer (p03/p11/d18/d19/p17) assumes. */
class IncrementalComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-components-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshRoot(): String =
    Files.createTempDirectory("components-state").toString

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("i", "j")
  }

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchTruth(pairs: Seq[(Long, Long)]): Set[(Long, Long)] =
    labelsOf(graft.analytics.Curation.contractComponents(spark, edgesDf(pairs)))

  /** Deterministic multi-component random graph: chains + random extra
    * edges inside blocks of 10 nodes, so components are non-trivial and
    * merges happen across batches. */
  private def syntheticEdges(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val chain = (0 until n).filter(_ % 10 != 9)
      .map(k => (k.toLong, k.toLong + 1))
    val extra = Seq.fill(n / 2) {
      val block = rnd.nextInt(n / 10) * 10
      (block + rnd.nextInt(10).toLong, block + rnd.nextInt(10).toLong)
    }.filter { case (a, b) => a != b }
    chain ++ extra
  }

  test("any batch split of a random multi-component graph converges to " +
      "the batch contraction") {
    val all = syntheticEdges(seed = 1, n = 200)
    val want = batchTruth(all)
    for (splits <- Seq(2, 3, 5)) {
      val root = freshRoot()
      all.grouped((all.size + splits - 1) / splits).zipWithIndex.foreach {
        case (b, i) => IncrementalComponents.merge(edgesDf(b), i.toLong, root)
      }
      assert(labelsOf(IncrementalComponents.view(spark, root).get) === want,
        s"split into $splits batches diverged from the batch contraction")
    }
  }

  test("delivery order does not matter: reversed batches converge too") {
    val all = syntheticEdges(seed = 2, n = 150)
    val want = batchTruth(all)
    val root = freshRoot()
    all.grouped(40).toSeq.reverse.zipWithIndex.foreach { case (b, i) =>
      IncrementalComponents.merge(edgesDf(b), i.toLong, root)
    }
    assert(labelsOf(IncrementalComponents.view(spark, root).get) === want)
  }

  test("a later edge MERGES two existing components and every member " +
      "relabels to the union minimum") {
    val root = freshRoot()
    IncrementalComponents.merge(edgesDf(Seq((2L, 3L), (7L, 8L))), 0L, root)
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      Set((2L, 2L), (3L, 2L), (7L, 7L), (8L, 7L)))
    // the bridge: both components collapse to min=2, including node 8
    // which the bridging edge never touches directly
    IncrementalComponents.merge(edgesDf(Seq((3L, 7L))), 1L, root)
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      Set((2L, 2L), (3L, 2L), (7L, 2L), (8L, 2L)))
  }

  test("real streaming query: edges through readStream/foreachBatch " +
      "produce the batch contraction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = syntheticEdges(seed = 3, n = 100)
    val root = freshRoot()
    val ckp = Files.createTempDirectory("components-ckp").toString
    val stream = MemoryStream[(Long, Long)]
    val q = IncrementalComponents.start(stream.toDS().toDF("i", "j"), root, ckp)
    val (h, t) = all.splitAt(all.size / 2)
    stream.addData(h)
    q.processAllAvailable()
    stream.addData(t)
    q.processAllAvailable()
    q.stop()
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      batchTruth(all))
  }

  test("replayed batch id is a no-op; re-delivered edges are idempotent") {
    val root = freshRoot()
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    IncrementalComponents.merge(edgesDf(edges), 0L, root)
    val v1 = labelsOf(IncrementalComponents.view(spark, root).get)
    IncrementalComponents.merge(edgesDf(edges), 0L, root) // same id: skipped
    assert(labelsOf(IncrementalComponents.view(spark, root).get) === v1)
    // recovered-batch path: same edges under a fresh id — rep graph is
    // empty (all intra-component), labels pass through unchanged
    IncrementalComponents.merge(edgesDf(edges), 1L, root)
    assert(labelsOf(IncrementalComponents.view(spark, root).get) === v1)
    assert(v1 === batchTruth(edges))
  }

  test("composed with the near-dup gate: arrival-time verified pairs " +
      "maintain the same labels a one-shot batch run would produce") {
    import spark.implicits._
    def text(prefix: String, changed: Int = -1): String =
      (1 to 40).map(i => if (i == changed) "CHANGED" else s"$prefix$i")
        .mkString(" ")
    // corpus: two near-dup families (docs 1,2 and docs 5,6) + a singleton
    val corpus = Seq(
      (1L, text("alpha")), (2L, text("alpha", changed = 7)),
      (5L, text("beta")), (6L, text("beta", changed = 30)),
      (9L, text("gamma"))).toDF("doc_id", "text")
    val (bands, shingles, counts) = IngestNearDup.corpusIndex(corpus)
    // arrivals in two micro-batches: 101 joins the alpha family,
    // 102 joins beta, 103 is fresh. EXACT copies, so band collision is
    // certain — this test pins the gate→components composition, not LSH
    // recall (d12 owns that)
    val batches = Seq(
      Seq((101L, text("alpha"))),
      Seq((102L, text("beta")), (103L, text("delta"))))
    val root = freshRoot()
    var allPairs = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (docs, i) =>
      // the gate's output frame feeds merge DIRECTLY — this pins the
      // documented (i, j) column contract between the two modules
      val pairsDf = IngestNearDup.verifiedPairs(
        docs.toDF("doc_id", "text"), bands, shingles, counts)
      allPairs ++= pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      IncrementalComponents.merge(pairsDf, i.toLong, root)
    }
    assert(allPairs.nonEmpty, "the gate must flag the planted near-dups")
    val got = labelsOf(IncrementalComponents.view(spark, root).get)
    assert(got === batchTruth(allPairs),
      "arrival-time component view diverged from the one-shot contraction")
    // and the families actually merged: 101 labels into min(alpha family)
    assert(got.contains((101L, 1L)) && got.contains((102L, 5L)))
    assert(!got.exists(_._1 == 103L), "fresh doc 103 must stay unlabeled")
  }

  test("an edge inside one existing component changes nothing; an edge " +
      "between two brand-new nodes starts its own component") {
    val root = freshRoot()
    IncrementalComponents.merge(edgesDf(Seq((5L, 6L))), 0L, root)
    IncrementalComponents.merge(edgesDf(Seq((5L, 6L), (20L, 21L))), 1L, root)
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      Set((5L, 5L), (6L, 5L), (20L, 20L), (21L, 20L)))
  }

  test("a self-loop edge labels its node as itself — the batch " +
      "contraction's (x, x) row — instead of dropping the node") {
    val root = freshRoot()
    IncrementalComponents.merge(edgesDf(Seq((9L, 9L), (1L, 2L))), 0L, root)
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      Set((9L, 9L), (1L, 1L), (2L, 1L)))
    assert(labelsOf(IncrementalComponents.view(spark, root).get) ===
      batchTruth(Seq((9L, 9L), (1L, 2L))))
  }
}
