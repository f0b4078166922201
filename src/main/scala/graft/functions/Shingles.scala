package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Word n-gram (shingle) generation.
  *
  * Measured on local[32] at sf0.1 (5k docs, 260k shingles): the SQL
  * higher-order form `transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i+1, k)))` runs ~5.9s because Catalyst evaluates lambda
  * higher-order functions in interpreted mode (no whole-stage codegen),
  * while this Scala UDF runs ~0.8s. A native codegen `Expression` would be
  * the ceiling, but the UDF already brings the operator to explode-speed
  * (explode of the token array alone is ~1.0s), so the remaining headroom
  * is noise. The UDF is a narrow per-row map — at 100 TB it scales linearly
  * with the scan, no shuffle implications.
  */
object Shingles {
  private def gen(k: Int, distinct: Boolean): UserDefinedFunction =
    udf { (ts: Seq[String]) =>
      if (ts == null || ts.length < k) Seq.empty[String]
      else {
        val all = ts.sliding(k).map(_.mkString(" ")).toVector
        if (distinct) all.distinct else all
      }
    }

  /** Distinct word k-grams of a token array (set semantics, for Jaccard /
    * MinHash signatures). */
  def distinctNgrams(k: Int)(toks: Column): Column = gen(k, distinct = true)(toks)

  /** All word k-grams in order (bag semantics, for frequency counting). */
  def ngrams(k: Int)(toks: Column): Column = gen(k, distinct = false)(toks)
}
