package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CdcChunksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("cdc-chunks-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def chunksOf(s: String, k: Int = 8, d: Long = 64L): Seq[String] = {
    val arr = CdcChunks.compute(UTF8String.fromString(s), k, d)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Naive reference for the boundary rule: direct per-position k-gram
    * hash (no rolling recurrence), boundary where h % d == d-1. */
  private def refEnds(s: String, k: Int, d: Long): Seq[Int] = {
    val n = s.length
    if (n == 0) Seq.empty
    else if (n < k) Seq(n)
    else {
      val interior = (k until n).filter { end =>
        var h = 0L
        for (j <- end - k until end) h = (h * 31 + s.charAt(j)) % CdcChunks.Mod
        h % d == d - 1
      }
      interior :+ n
    }
  }

  test("chunk ends match the direct per-gram reference") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh mnopqrst"
    for (i <- 0 until 100) {
      val s = Seq.fill(rnd.nextInt(800))(alpha(rnd.nextInt(alpha.length))).mkString
      for (d <- Seq(16L, 64L)) {
        assert(CdcChunks.chunkEnds(s, 8, d).toSeq === refEnds(s, 8, d), s"iter $i d=$d")
      }
    }
  }

  test("chunks concatenate back to the input exactly") {
    val rnd = new scala.util.Random(11)
    for (i <- 0 until 50) {
      val s = Seq.fill(rnd.nextInt(2000))((rnd.nextInt(94) + 33).toChar).mkString
      assert(chunksOf(s).mkString === s, s"iter $i")
    }
    assert(chunksOf("") === Seq.empty)
    assert(chunksOf("short") === Seq("short")) // below k: one chunk
  }

  test("insertion robustness: an edit perturbs O(1) chunks; fixed tiles shift all downstream") {
    val rnd = new scala.util.Random(23)
    val doc = Seq.fill(4000)("abcdefghij klmnop".charAt(rnd.nextInt(17))).mkString
    val edited = doc.substring(0, 100) + "X" + doc.substring(100)

    // CDC: boundaries are pure functions of their local k chars, so all
    // chunks not overlapping the edit keep their identity
    def multiset(xs: Seq[String]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    val a = multiset(chunksOf(doc))
    val b = multiset(chunksOf(edited))
    val common = a.keySet.intersect(b.keySet)
      .toSeq.map(key => math.min(a(key), b(key))).sum
    val total = a.values.sum
    assert(total - common <= 3,
      s"CDC: expected <=3 perturbed chunks, got ${total - common} of $total")

    // fixed 64-char tiles: every tile after the edit shifts
    def tiles(s: String) = s.grouped(64).toSeq
    val ta = multiset(tiles(doc)); val tb = multiset(tiles(edited))
    val tcommon = ta.keySet.intersect(tb.keySet)
      .toSeq.map(key => math.min(ta(key), tb(key))).sum
    assert(tcommon <= 3,
      s"fixed tiles should lose nearly all alignment, kept $tcommon")
  }

  test("mean chunk length tracks the divisor") {
    val rnd = new scala.util.Random(31)
    val doc = Seq.fill(50000)((rnd.nextInt(26) + 'a').toChar).mkString
    val cs = chunksOf(doc, 8, 64L)
    val mean = doc.length.toDouble / cs.size
    assert(mean > 32 && mean < 128, s"mean chunk length $mean, expected ~64")
  }

  test("codegen and interpreted eval agree; null-safe; SQL-registered") {
    import spark.implicits._
    val df = Seq(Some("the quick brown fox jumps over the lazy dog " * 20),
      Some(""), None, Some("tiny")).toDF("text")
    df.createOrReplaceTempView("cdc_chunks_in")
    val sqlRows = spark.sql(
      "SELECT cdc_chunks(text, 8, 64) AS cs FROM cdc_chunks_in").collect()
    val expected = Seq(Some("the quick brown fox jumps over the lazy dog " * 20),
      Some(""), None, Some("tiny"))
      .map(_.map(s => chunksOf(s)))
    val got = sqlRows.map(r =>
      if (r.isNullAt(0)) None else Some(r.getSeq[String](0)))
    assert(got.toSeq === expected)

    // interpreted eval path (no codegen) through the kernel directly
    assert(chunksOf("the quick brown fox").mkString === "the quick brown fox")
  }
}
