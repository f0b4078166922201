package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `cdc_chunks(text[, k, divisor])` —
  * content-defined chunking: split a string at positions where the
  * polynomial rolling hash of the trailing `k`-gram satisfies
  * `h % divisor == divisor - 1` (LBFS/gear-style basic CDC, no min/max
  * clamp so a boundary is a pure function of its local `k` characters).
  *
  * The property fixed-size tiles (d09) cannot give: inserting or deleting
  * a character shifts every downstream tile, but CDC boundaries realign
  * after at most `k` characters, so an edit perturbs O(1) chunks and the
  * rest keep their identity — the storage-dedup contract (LBFS, Venti,
  * restic all rest on it). Expected chunk length = `divisor` characters.
  *
  * Same O(n) rolling recurrence and modulus family as
  * [[WinnowFingerprints]] (base 31, mod 2^25), single pass, codegen
  * citizen: string → array<string> of the chunk substrings, which
  * concatenate back to the input exactly (spec-locked invariant).
  */
final case class CdcChunks(child: Expression, k: Int, divisor: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && divisor >= 2 && divisor <= CdcChunks.Mod =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks: need k>=1, 2<=divisor<=2^25 (got k=$k divisor=$divisor)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], k, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks$$.MODULE$$.compute($c, $k, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** Fixed rolling-hash modulus (t08's 2^25 — well under the Long-wrap
    * bound documented in [[WinnowFingerprints]]). */
  val Mod: Long = 1L << 25

  /** 1-based end positions of every chunk: interior positions `i` in
    * `[k, n)` where the k-gram ending at `i` hits the divisor condition,
    * plus the final position `n`. Empty for the empty string; `[n]` for
    * strings shorter than `k`. */
  def chunkEnds(norm: String, k: Int, divisor: Long): Array[Int] = {
    val n = norm.length
    if (n == 0) return Array.empty
    if (n < k) return Array(n)
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    val powk = {
      var p = 1L; var j = 0
      while (j < k - 1) { p = p * 31 % Mod; j += 1 }
      p
    }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31 + norm.charAt(i)) % Mod; i += 1 }
    if (k < n && h % divisor == divisor - 1) ends += k
    i = 1
    while (i <= n - k) {
      h = Math.floorMod((h - norm.charAt(i - 1) * powk) * 31 + norm.charAt(i + k - 1), Mod)
      val end = i + k
      if (end < n && h % divisor == divisor - 1) ends += end
      i += 1
    }
    ends += n
    ends.toArray
  }

  /** Kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, divisor: Long): ArrayData = {
    val norm = s.toString
    val ends = chunkEnds(norm, k, divisor)
    val out = new Array[AnyRef](ends.length)
    var start = 0
    var j = 0
    while (j < ends.length) {
      out(j) = UTF8String.fromString(norm.substring(start, ends(j)))
      start = ends(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("cdc_chunks")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CdcChunks].getCanonicalName, null, "cdc_chunks",
    "_FUNC_(text, k, divisor) - content-defined chunks: split where the rolling k-gram hash % divisor == divisor-1.", "")

  val builder: Seq[Expression] => Expression = { args =>
    def longArg(e: Expression, what: String): Long = e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"cdc_chunks: $what must be int, got $other")
    }
    args match {
      case Seq(text) => CdcChunks(text, 8, 64L)
      case Seq(text, kE, dE) =>
        CdcChunks(text, longArg(kE, "k").toInt, longArg(dE, "divisor"))
      case _ => throw new IllegalArgumentException(
        "cdc_chunks expects (text[, k, divisor])")
    }
  }

  /** Idempotent per-session SQL registration (also injected by
    * [[graft.GraftExtensions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)

  /** Column form for the query layer. */
  def chunks(k: Int, divisor: Long)(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), k, divisor))
  }
}
