package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `winnow_fingerprints(text[, k, w])` —
  * MOSS-style winnowing fingerprints (see [[RollingHash]] for the O(n)
  * rolling recurrence) as a whole-stage-codegen citizen: string →
  * array<bigint>, no encoder boundary, fused with the surrounding
  * tokenize/explode stages like [[WordNgrams]].
  */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int, mod: Long)
    extends UnaryExpression {

  // mod cap: the rolling recurrence computes (h − c·powk)·31 + c with
  // h, powk < mod and c ≤ 0xffff, so the magnitude reaches ~31·2^16·mod;
  // mod ≤ 2^40 keeps that under 2^62 — beyond it the Long silently wraps
  // and fingerprints stop matching the documented congruence
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 && mod >= 2 && mod <= WinnowFingerprints.MaxMod =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints: need k>=1, w>=1, 2<=mod<=2^40 (got k=$k w=$w mod=$mod)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints$$.MODULE$$.compute($c, $k, $w, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Largest safe modulus for the rolling recurrence (see the type check). */
  val MaxMod: Long = 1L << 40

  /** Kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int, mod: Long): ArrayData =
    new GenericArrayData(RollingHash.compute(s.toString, k, w, mod))

  val identifier: FunctionIdentifier = FunctionIdentifier("winnow_fingerprints")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WinnowFingerprints].getCanonicalName, null, "winnow_fingerprints",
    "_FUNC_(text, k, w) - winnowed rolling-hash fingerprints of k-char grams, window w.", "")

  val builder: Seq[Expression] => Expression = { args =>
    def intArg(e: Expression, what: String): Int = e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"winnow_fingerprints: $what must be int, got $other")
    }
    args match {
      case Seq(text) => WinnowFingerprints(text, 8, 4, 1L << 25)
      case Seq(text, kE, wE) =>
        WinnowFingerprints(text, intArg(kE, "k"), intArg(wE, "w"), 1L << 25)
      case _ => throw new IllegalArgumentException(
        "winnow_fingerprints expects (text[, k, w])")
    }
  }

  /** Idempotent per-session SQL registration (also injected by
    * [[graft.GraftExtensions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
