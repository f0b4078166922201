package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** MOSS-style winnowing fingerprints: polynomial rolling hash (base 31,
  * modulus `mod`) over `k`-char grams, then the min hash of every sliding
  * window of `w` grams, distinct.
  *
  * A true O(n) rolling recurrence — NOT the naive per-gram sum, and not a
  * SQL higher-order `transform`: the HOF form both runs interpreted and
  * re-inlines the (regex) normalization expression into every array
  * element, turning an O(n) pass into O(n³) work per document (measured:
  * single sf0.01 partition >18 min CPU; this UDF: milliseconds). Congruence
  * identity keeps results equal to the oracle's direct
  * `sum(c_j·31^(k-1-j)) mod M` formulation.
  */
object RollingHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Native-expression form (preferred): stays inside whole-stage codegen —
    * see [[WinnowFingerprints]]. */
  def winnow(k: Int, w: Int, mod: Long)(text: Column): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w, mod))

  /** UDF form, kept as the measured baseline for the native expression. */
  def winnowFingerprints(k: Int, w: Int, mod: Long): UserDefinedFunction =
    udf((norm: String) => compute(norm, k, w, mod))

  /** The pure function the UDF wraps (unit-tested directly). */
  def compute(norm: String, k: Int, w: Int, mod: Long): Array[Long] = {
      require(mod >= 2 && mod <= WinnowFingerprints.MaxMod,
        s"mod must be in [2, 2^40] — the rolling recurrence reaches ~31*2^16*mod and " +
          s"silently wraps Long beyond that (got $mod)")
      if (norm == null || norm.length < k) Array.empty[Long]
      else {
        val n = norm.length
        val grams = new Array[Long](n - k + 1)
        val powk = {
          var p = 1L
          var j = 0
          while (j < k - 1) { p = p * 31 % mod; j += 1 }
          p
        }
        var h = 0L
        var i = 0
        while (i < k) { h = (h * 31 + norm.charAt(i)) % mod; i += 1 }
        grams(0) = h
        i = 1
        while (i <= n - k) {
          h = Math.floorMod((h - norm.charAt(i - 1) * powk) * 31 + norm.charAt(i + k - 1), mod)
          grams(i) = h
          i += 1
        }
        if (grams.length < w) Array.empty[Long]
        else {
          val out = scala.collection.mutable.SortedSet.empty[Long]
          var p = 0
          while (p <= grams.length - w) {
            var m = grams(p)
            var j = p + 1
            while (j < p + w) { if (grams(j) < m) m = grams(j); j += 1 }
            out += m
            p += 1
          }
          out.toArray
        }
      }
  }
}
