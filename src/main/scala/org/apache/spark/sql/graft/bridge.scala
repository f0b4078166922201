package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column<->Expression converters —
  * the supported way for a library to wrap its own Catalyst expressions as
  * user-facing Columns in Spark 4's ColumnNode world. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` Dataset<->LogicalPlan converters — what a
  * library needs to expose an operator backed by its own LogicalPlan node
  * (see `graft.plans.TopKPerKey`). */
object PlanBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge replicating `Dataset.checkpoint(eager = true)` /
  * `localCheckpoint(eager = true)` with two upgrades the stock path
  * cannot give:
  *
  *  1. it RETURNS the row count the eager action computes and throws away
  *     (Spark runs `internalRdd.count()` to force the checkpoint), so
  *     iterated operators (component contraction, BFS) get "materialize
  *     this pass AND tell me if it is empty" in ONE job instead of two;
  *  2. it swaps the LogicalRDD leaf's statistics — which `fromDataset`
  *     copies from the ORIGIN plan's optimizer estimates, compounding
  *     join-inflation garbage after a few iterations — for EXACT ones
  *     (rowCount from the count, sizeInBytes = rows x schema width), so
  *     downstream planning can auto-broadcast genuinely-small iterated
  *     frames and keeps sort-merge for genuinely-big ones. The stats are
  *     runtime-measured, so the decision stays scale-adaptive.
  */
object MaterializeBridge {
  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, ExpressionSet}
  import org.apache.spark.sql.catalyst.plans.logical.Statistics
  import org.apache.spark.sql.execution.LogicalRDD

  def checkpointCounted[T](ds0: Dataset[T], reliable: Boolean): (Dataset[T], Long) = {
    val ds = ds0.asInstanceOf[org.apache.spark.sql.classic.Dataset[T]]
    // same shape as Dataset.checkpoint: copy rows out of the unsafe-row
    // buffer reuse, checkpoint the internal RDD, force it with count()
    val internalRdd = ds.queryExecution.toRdd.map(_.copy())
    if (reliable) internalRdd.checkpoint() else internalRdd.localCheckpoint()
    val n = internalRdd.count()
    // fromDataset rewrites the origin plan's output partitioning,
    // ordering and constraints onto the new leaf, like Dataset.checkpoint
    val lr = LogicalRDD.fromDataset(internalRdd, ds, isStreaming = false)
    val rowBytes = 8L + lr.output.map(_.dataType.defaultSize.toLong).sum
    val stats = Statistics(sizeInBytes = math.max(n * rowBytes, 1L),
      rowCount = Some(BigInt(n)))
    // keep the constraint rewrite fromDataset performed (no accessor on
    // the private second-list param — recompute it the same way)
    val opt = ds.queryExecution.optimizedPlan
    val attrMap = AttributeMap(opt.output.zip(lr.output))
    val constraints = ExpressionSet(opt.constraints.map(_.transform {
      case a: Attribute => attrMap.getOrElse(a, a)
    }))
    val withStats = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
      lr.outputOrdering, lr.isStreaming, lr.stream)(
      ds.sparkSession, Some(stats), Some(constraints))
    (new org.apache.spark.sql.classic.Dataset[T](ds.sparkSession, withStats,
      ds.encoder), n)
  }
}
