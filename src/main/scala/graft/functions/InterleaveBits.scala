package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression `interleave_bits(x, y)` — the Z-order
  * (Morton) key: the low 32 bits of `x` and `y` interleaved into one
  * 64-bit value, `x` on the even bit lanes, `y` on the odd.
  *
  * This is the clustering key for multi-dimensional data layout: sorting
  * by `interleave_bits(a, b)` keeps rows close in BOTH dimensions close
  * in the file order, so per-file min/max statistics stay tight on BOTH
  * columns and a predicate on either one prunes files — a linear sort
  * gives perfect pruning on its leading column and none on the other.
  * At 100 TB this is the difference between a full scan and reading a
  * few percent of files for the non-leading dimension (the layout trick
  * Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a pure
  * column expression usable with plain `repartitionByRange` + sorted
  * parquet writes — see `ZOrderSpec` for the measured file-skipping
  * effect).
  *
  * The bit spread is the classic mask-doubling sequence — 5 shift/mask
  * steps per operand, branch-free, no allocation, and it participates in
  * whole-stage codegen. Negative inputs are masked to their low 32 bits
  * (callers Z-order non-negative keys or rank-quantized values).
  */
final case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.InterleaveBits$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Spread the low 32 bits of `v` onto the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Kernel shared by interpreted eval and generated code. */
  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  // ---- SQL registration (interleave_bits(x, y)) ----

  val identifier: FunctionIdentifier = FunctionIdentifier("interleave_bits")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[InterleaveBits].getCanonicalName, null, "interleave_bits",
    "_FUNC_(x, y) - Z-order (Morton) interleave of the low 32 bits of two bigints.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => InterleaveBits(a, b)
    case args => throw new IllegalArgumentException(
      s"interleave_bits expects exactly 2 arguments, got ${args.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
