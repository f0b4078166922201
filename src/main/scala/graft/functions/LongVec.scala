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

/** `sorted_intersect_count(a, b)` = |a ∩ b| for two SORTED `array<bigint>`
  * columns — the compact-forward triangle kernel (p21): per oriented edge
  * (u→v) it counts |N⁺(u) ∩ N⁺(v)| in one merge pass. The built-in
  * `size(array_intersect(a, b))` allocates a per-row hash set AND the
  * matched-element array when only the count is needed; this is a fused
  * two-pointer merge — zero allocation, whole-stage codegen. On near-dup
  * components (near-cliques: sf0.1 has 15.8M wedge probes over 166k
  * edges) the intersection loops are THE hot path of the transitivity
  * audit.
  *
  * Contract: both arrays ascending-sorted, no null elements (the caller
  * builds them with sort_array over non-null ids); duplicate elements
  * count min(multiplicity) times like a sorted-bag merge — callers pass
  * sets. Null ARRAY → null via BinaryExpression's null intercept. */
final case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCount$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { acc += 1L; i += 1; j += 1 }
    }
    acc
  }

  // ---- SQL registration (sorted_intersect_count(a, b)) ----

  val identifier: FunctionIdentifier = FunctionIdentifier("sorted_intersect_count")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getCanonicalName, null, "sorted_intersect_count",
    "_FUNC_(a, b) - count of common elements of two sorted bigint arrays.", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => SortedIntersectCount(a, b)
    case args => throw new IllegalArgumentException(
      s"sorted_intersect_count expects exactly 2 arguments, got ${args.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
