package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact-integer vector kernels of the
  * similarity family: `long_dot(a, b)` = Σ a(i)·b(i) over two
  * `array<bigint>` columns (`long_dot(a, a)` is the squared norm).
  *
  * This replaces the interpreted higher-order form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0L, _+_)`: Catalyst evaluates
  * lambda HOFs row-at-a-time with a per-element closure dispatch AND
  * materializes the zipped product array, while this expression is one
  * fused primitive loop over the two `ArrayData` buffers, participates in
  * whole-stage codegen, and allocates nothing. The candidate-verify joins
  * (s01/s02/s07/s08, d06, and the brute-force ground truths) each evaluate
  * it 10⁵–10⁶ times per run at test SF — at 100 TB it is THE hot loop of
  * every ANN/dedup verify stage. Measured at sf0.1: s07 warm 1.61s → see
  * commit for the post-swap numbers.
  *
  * Semantics: null input array → null (BinaryExpression's default
  * null-intercepting eval); null ELEMENTS are treated as 0 (our vectors
  * are never element-null — they come from `transform(round(...))`); if
  * lengths differ the shorter length bounds the loop (zip_with would pad
  * with null products — another thing that cannot happen upstream, both
  * sides are fixed-dim embeddings).
  */
final case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dot expects (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LongDot$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {

  /** Kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  // ---- SQL registration (long_dot(a, b)) ----

  val identifier: FunctionIdentifier = FunctionIdentifier("long_dot")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LongDot].getCanonicalName, null, "long_dot",
    "_FUNC_(a, b) - exact integer dot product of two bigint arrays.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => LongDot(a, b)
    case args => throw new IllegalArgumentException(
      s"long_dot expects exactly 2 arguments, got ${args.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}

/** `long_ssd(a, b)` = Σ (a(i) − b(i))² — the exact-integer squared
  * euclidean distance the PQ family (s13/s14) evaluates per (residual
  * subvector × candidate centroid), i.e. up to 64× corpus rows per run.
  * The composed form `long_dot(zip_with(a,b,(x,y)=>x-y), same)` pays the
  * interpreted HOF dispatch AND materializes the difference array per
  * evaluation; this is the LongDot shape — one fused primitive loop, no
  * allocation, whole-stage codegen. Null/length semantics as LongDot
  * (never hit upstream: fixed-dim quantized slices on both sides). */
final case class LongSsd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_ssd expects (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_ssd"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongSsd.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LongSsd$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSsd =
    copy(left = newLeft, right = newRight)
}

object LongSsd {

  /** Kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  // ---- SQL registration (long_ssd(a, b)) ----

  val identifier: FunctionIdentifier = FunctionIdentifier("long_ssd")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LongSsd].getCanonicalName, null, "long_ssd",
    "_FUNC_(a, b) - exact integer squared euclidean distance of two bigint arrays.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => LongSsd(a, b)
    case args => throw new IllegalArgumentException(
      s"long_ssd expects exactly 2 arguments, got ${args.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
