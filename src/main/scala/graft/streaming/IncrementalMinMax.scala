package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental MIN/MAX view maintenance over a CDC change stream — the
  * aggregate family [[IncrementalAgg]] deliberately does NOT cover.
  *
  * COUNT/SUM are self-maintainable: a delete applies as a negative delta.
  * MIN/MAX are not — deleting the current minimum needs the runner-up,
  * which the (grp → min) view alone has already forgotten. The standard
  * IVM answer (Gupta & Mumick's taxonomy) is an auxiliary view with
  * enough support to answer "what's next": here the per-(group, value)
  * MULTIPLICITY table. Inserts contribute (grp, v, +1), deletes
  * (grp, v, −1), updates both; values whose multiplicity reaches zero
  * drop out, and `view` derives (grp, min_v, max_v, n_rows, n_distinct)
  * by aggregating the surviving support rows. Deleting one of two equal
  * minima keeps the min; deleting the last one exposes the runner-up —
  * both for free, because the support never lied.
  *
  * Exactly-once under foreachBatch replay is the [[SnapshotStore]]
  * batch-id contract, same as IncrementalAgg. NULL values participate in
  * the support (their multiplicity is tracked, so row counts stay exact)
  * but are excluded from min/max, matching batch `MIN`/`MAX` semantics.
  *
  * At 100 TB: per-batch work is O(batch + touched (grp, value) rows) —
  * one small shuffle keyed (grp, v), one full-outer merge against the
  * support snapshot — and the support's size is the distinct-value count
  * per group, the irreducible price of non-self-maintainable aggregates
  * (a production deployment bounds it the usual ways: bucketize values,
  * or accept recompute-on-underflow for a capped top-k support). The
  * base table is never re-scanned.
  */
object IncrementalMinMax {

  /** Reduce one batch of change rows to per-(grp, value) multiplicity
    * deltas. Change-row columns: `op` ('i'|'u'|'d'), `grp_old`,
    * `amount_old` (null for inserts), `grp_new`, `amount_new` (null for
    * deletes) — the [[IncrementalAgg.deltas]] contract. */
  def deltas(ops: DataFrame): DataFrame = {
    val retract = ops.filter(col("op").isin("u", "d"))
      .select(col("grp_old").as("grp"), col("amount_old").as("v"), lit(-1L).as("dc"))
    val add = ops.filter(col("op").isin("i", "u"))
      .select(col("grp_new").as("grp"), col("amount_new").as("v"), lit(1L).as("dc"))
    retract.unionByName(add)
      .groupBy("grp", "v")
      .agg(sum(col("dc")).as("dc"))
  }

  /** The per-batch merge frame (seam for plan-shape assertions): the
    * support snapshot full-outer-merged with the batch's deltas on the
    * null-safe (grp, v) key — one join, no window, leaves = snapshot +
    * batch only. */
  private[streaming] def mergedFrame(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur match {
      case Some(cur) =>
        cur.as("c").join(d.as("d"),
          col("c.grp") <=> col("d.grp") && col("c.v") <=> col("d.v"), "full_outer")
          .select(
            coalesce(col("c.grp"), col("d.grp")).as("grp"),
            coalesce(col("c.v"), col("d.v")).as("v"),
            (coalesce(col("c.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L))).as("cnt"))
      case None =>
        d.select(col("grp"), col("v"), col("dc").as("cnt"))
    }

  /** Apply one batch's deltas to the support at `stateRoot`; replayed
    * batches are skipped by batch id (exactly-once). */
  def merge(ops: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = ops.sparkSession
    import graft.GraftSession.MaterializeOps
    val d = deltas(ops).materialized
    // support rows bucket on (grp, v) — the merge's own join key — and the
    // merge is read-pruned: only the touched (grp, value) pairs' buckets
    // are read and rewritten, the rest ride the manifest
    val buckets = SnapshotStore.bucketsFor(spark, Seq("grp", "v"))
    val tb = SnapshotStore.bucketIds(d.select("grp", "v"), buckets)
    val merged = mergedFrame(
      SnapshotStore.readTouched(spark, stateRoot, buckets, tb), d)
    SnapshotStore.writeNextBuckets(merged.filter(col("cnt") =!= 0L), stateRoot,
      Some(batchId), buckets, Some(tb))
  }

  /** Start the streaming maintainer over a change stream. */
  def start(ops: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    ops.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** The raw support view (grp, v, cnt). */
  def read(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot)

  /** The maintained aggregate view: (grp, min_v, max_v, n_rows,
    * n_distinct). min/max ignore NULL values (batch semantics); n_rows
    * counts every surviving row including NULL-valued ones; n_distinct
    * counts distinct non-null values. A group whose rows are all deleted
    * has no support rows and disappears — same as batch GROUP BY. */
  def view(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    read(spark, stateRoot).map(_
      .groupBy("grp")
      .agg(
        min(when(col("v").isNotNull, col("v"))).as("min_v"),
        max(when(col("v").isNotNull, col("v"))).as("max_v"),
        sum(col("cnt")).as("n_rows"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct")))
}
