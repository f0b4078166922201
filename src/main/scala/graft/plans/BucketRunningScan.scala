package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** The per-partition carry pass of [[PrefixScan]] as a first-class physical
  * operator: appends a LONG running aggregate (`op` ∈ max/min/sum) of `v`
  * that RESETS whenever the `bkt` column changes, reading and emitting
  * InternalRows directly.
  *
  * Why not `Dataset.mapPartitions`: the encoder boundary deserializes every
  * input row to a `Row`, builds a `Seq`, appends, and re-encodes — measured
  * as the dominant per-row cost of e31/e33 (the scan runs over the whole
  * events table, twice per query because the carries subtree and the join
  * subtree both consume it). This node does one `JoinedRow` + unsafe
  * projection per row — the same shape Spark's own WindowExec uses — and,
  * like the `mapPartitions` it replaces, is an opaque barrier to column
  * pruning, which is what forces the two consumers onto ONE reused exchange
  * (see the carries note in [[PrefixScan.scan]]).
  *
  * CALLER CONTRACT (enforced by [[PrefixScan]], not re-checked here): the
  * input must already be hash-distributed on `bkt` and sorted by
  * (`bkt`, order) within partitions; the node itself is a narrow
  * partition-preserving map.
  */
final case class BucketRunningScan(
    bkt: Attribute,
    v: Attribute,
    op: String,
    outAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  // Reference EVERY child column, not just (bkt, v): the node must be a
  // column-pruning barrier like the Dataset.mapPartitions it replaced —
  // otherwise the carries consumer (which reads only bkt/v) gets a
  // narrower pre-exchange projection than the join consumer and the two
  // bucket-shuffle subtrees stop being reusable (the corpus would shuffle
  // TWICE — the exact regression the carries-from-scanned note pins).
  override lazy val references: AttributeSet = AttributeSet(child.output)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): BucketRunningScan =
    copy(child = newChild)
}

final case class BucketRunningScanExec(
    bkt: Attribute,
    v: Attribute,
    op: String,
    outAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val bktIdx = child.output.indexWhere(_.exprId == bkt.exprId)
    val vIdx = child.output.indexWhere(_.exprId == v.exprId)
    require(bktIdx >= 0 && vIdx >= 0,
      s"BucketRunningScan: bkt/v not found in child output ${child.output}")
    val combine: (Long, Long) => Long = op match {
      case "max" => math.max
      case "min" => math.min
      case "sum" => _ + _
      case other => throw new IllegalArgumentException(s"unknown scan op '$other'")
    }
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val join = new JoinedRow
      val extra = new GenericInternalRow(1)
      var cur = Int.MinValue
      var hasAcc = false
      var acc = 0L
      var first = true
      it.map { row =>
        val b = row.getInt(bktIdx)
        if (first || b != cur) { cur = b; hasAcc = false; first = false }
        if (!row.isNullAt(vIdx)) {
          val x = row.getLong(vIdx)
          acc = if (hasAcc) combine(acc, x) else x
          hasAcc = true
        }
        if (hasAcc) extra.setLong(0, acc) else extra.setNullAt(0)
        proj(join(row, extra))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): BucketRunningScanExec =
    copy(child = newChild)
}

object BucketRunningScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BucketRunningScan(b, v, op, out, child) =>
      BucketRunningScanExec(b, v, op, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

object BucketRunningScan {

  /** Append `out` = running `op` of `vName` over each partition's sorted
    * rows, resetting at `bktName` changes. Self-registers its strategy
    * (the [[TopK.perKey]] pattern) so it works on any session. */
  private[plans] def append(df: DataFrame, bktName: String, vName: String,
      outName: String, op: String): DataFrame = {
    val spark = df.sparkSession
    PlanRegistry.withLock(spark) {
      if (!spark.experimental.extraStrategies.contains(BucketRunningScanStrategy))
        spark.experimental.extraStrategies ++= Seq(BucketRunningScanStrategy)
    }
    val child = PlanBridge.logicalPlan(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column '$n' not in ${child.output.map(_.name).mkString(", ")}"))
    val out = AttributeReference(outName, LongType, nullable = true)()
    PlanBridge.ofRows(spark,
      BucketRunningScan(attr(bktName), attr(vName), op, out, child))
  }
}
