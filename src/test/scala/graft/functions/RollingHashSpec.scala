package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The O(n) rolling recurrence must equal the oracle's direct
  * `sum(c_j·31^(k-1-j)) mod M` per-gram formulation (exact arithmetic,
  * single mod) for every gram, and winnowing must pick sliding-window
  * minima. */
class RollingHashSpec extends AnyFunSuite {

  private val K = 8; private val W = 4; private val M = 1L << 25

  private def directGrams(s: String): Vector[Long] =
    (0 to s.length - K).map { i =>
      (0 until K).map(j => BigInt(s.charAt(i + j).toInt) * BigInt(31).pow(K - 1 - j)).sum
        .mod(BigInt(M)).toLong
    }.toVector

  private def directWinnow(s: String): Vector[Long] = {
    val g = directGrams(s)
    if (g.length < W) Vector.empty
    else (0 to g.length - W).map(p => g.slice(p, p + W).min).toVector.distinct.sorted
  }

  private def udfWinnow(s: String): Vector[Long] =
    RollingHash.compute(s, K, W, M).toVector

  test("rolling recurrence equals the direct polynomial mod for random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val s = (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      assert(udfWinnow(s) == directWinnow(s), s"mismatch for: $s")
    }
  }

  test("native expression and SQL registration agree with the pure function") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      WinnowFingerprints.register(spark)
      val s = "the quick brown fox jumps over the lazy dog"
      val viaCol = Seq(s).toDF("t")
        .select(RollingHash.winnow(K, W, M)($"t")).as[Seq[Long]].head
      val viaSql = spark.sql(
        s"SELECT winnow_fingerprints('$s', $K, $W)").as[Seq[Long]].head
      assert(viaCol == RollingHash.compute(s, K, W, M).toSeq)
      assert(viaSql == viaCol)
    } finally spark.stop()
  }

  test("short inputs produce no fingerprints") {
    assert(udfWinnow("") == Vector.empty)
    assert(udfWinnow("abcdefg") == Vector.empty) // 7 chars < k grams
    assert(udfWinnow("abcdefgh") == Vector.empty) // 1 gram < w windows
    assert(udfWinnow("abcdefghijk").size == 1) // 4 grams = exactly 1 window
  }
}
