package graft.functions

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-gram (shingle) generation:
  * `word_ngrams(tokens, n, distinct)` — array<string> → array<string>.
  *
  * This is the codegen ceiling above the Scala UDF in [[Shingles]]: the
  * generated Java calls a static kernel directly on `ArrayData`/`UTF8String`
  * (no catalyst→scala conversion of the token array per row, no encoder
  * boundary), and the expression participates in whole-stage codegen, so
  * tokenize → ngrams → explode stays one fused pipeline stage. Compare the
  * interpreted SQL higher-order `transform(sequence(...), ...)` form, which
  * measured ~7x slower at sf0.1 (Catalyst evaluates lambda HOFs interpreted).
  */
final case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams: n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgrams$$.MODULE$$.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SPACE = UTF8String.fromString(" ")

  /** Kernel shared by interpreted eval and generated code. Null tokens are
    * treated as empty strings; `distinct` keeps first-occurrence order
    * (matching Vector.distinct / DuckDB list_distinct semantics). */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val count = len - n + 1
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = gram(arr, i, n)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(gram(arr, i, n))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  private def gram(arr: ArrayData, start: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(start + j)
      parts(j) = if (s == null) UTF8String.EMPTY_UTF8 else s
      j += 1
    }
    UTF8String.concatWs(SPACE, parts: _*)
  }

  // ---- SQL registration (word_ngrams(tokens, n[, distinct])) ----

  val identifier: FunctionIdentifier = FunctionIdentifier("word_ngrams")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNgrams].getCanonicalName, null, "word_ngrams",
    "_FUNC_(tokens, n, distinct) - word n-grams of a token array.", "")

  val builder: Seq[Expression] => Expression = { args =>
    def intArg(e: Expression): Int = e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"word_ngrams: n must be int, got $other")
    }
    args match {
      case Seq(tokens, nE) => WordNgrams(tokens, intArg(nE), distinct = false)
      case Seq(tokens, nE, dE) =>
        WordNgrams(tokens, intArg(nE), dE.eval(null).asInstanceOf[Boolean])
      case _ => throw new IllegalArgumentException(
        "word_ngrams expects (tokens, n[, distinct])")
    }
  }

  /** Idempotent per-session SQL registration (also injected by
    * [[graft.GraftExtensions]] for spark.sql.extensions wiring). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
