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
  import org.apache.spark.sql.graft.ColumnBridge
  private def native(k: Int, distinct: Boolean)(toks: Column): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(toks), k, distinct))

  /** Distinct word k-grams of a token array (set semantics, for Jaccard /
    * MinHash signatures). */
  def distinctNgrams(k: Int)(toks: Column): Column = native(k, distinct = true)(toks)

  /** All word k-grams in order (bag semantics, for frequency counting). */
  def ngrams(k: Int)(toks: Column): Column = native(k, distinct = false)(toks)

  /** UDF form, kept as the measured baseline the native expression is
    * compared against (see DiagSpec history: HOF 5.9s / UDF 0.8s / native
    * expression fastest, all at sf0.1). */
  def udfNgrams(k: Int, distinct: Boolean): UserDefinedFunction =
    udf { (ts: Seq[String]) =>
      if (ts == null || ts.length < k) Seq.empty[String]
      else {
        val all = ts.sliding(k).map(_.mkString(" ")).toVector
        if (distinct) all.distinct else all
      }
    }
}
