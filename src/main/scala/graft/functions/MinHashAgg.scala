package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` computing a 16-lane MinHash signature per group —
  * the §2.11 UDAF surface: `minhash16(ha, hb)` over one (ha, hb) base-hash
  * pair per element, lanes derived by Kirsch–Mitzenmacher double hashing
  * (`lane_h = min(ha + h·hb)`), exactly the signature d03 builds with 16
  * separate `min()` expressions.
  *
  * Why an Aggregator instead of 16 expressions: the buffer is ONE
  * `Array[Long](16)` updated in place per input row — partial-aggregates
  * map-side and merges element-wise, so the shuffle carries 16 longs per
  * group regardless of group size (the same contract as the expression
  * form, but reusable as a single SQL-callable function, and the lane
  * count is a constructor parameter rather than copy-pasted columns).
  */
object MinHashAgg {

  final case class HashPair(ha: Long, hb: Long)

  final class MinHash(val lanes: Int)
      extends Aggregator[HashPair, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(lanes)(Long.MaxValue)
    override def reduce(b: Array[Long], a: HashPair): Array[Long] = {
      var h = 0
      while (h < lanes) {
        val v = a.ha + h * a.hb // 52-bit md5 halves: ha + 15*hb < 2^56, no overflow
        if (v < b(h)) b(h) = v
        h += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var h = 0
      while (h < lanes) { if (y(h) < x(h)) x(h) = y(h); h += 1 }
      x
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `minhash16(ha, hb)`. */
  def minhash16(ha: Column, hb: Column): Column = udaf(new MinHash(16)).apply(ha, hb)

  /** SQL registration: `SELECT minhash16(ha, hb) ... GROUP BY ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("minhash16", udaf(new MinHash(16)))
}
