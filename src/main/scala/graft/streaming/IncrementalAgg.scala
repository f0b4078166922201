package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental view maintenance for a grouped aggregate over a CDC change
  * stream — the materialized `SELECT grp, COUNT(*), SUM(amount) GROUP BY
  * grp` that stays correct under inserts, deletes, and updates (including
  * updates that MOVE a row between groups) without ever recomputing from
  * the base table.
  *
  * The delta algebra: insert contributes (+1, +amount_new) to its group;
  * delete contributes (−1, −amount_old); update contributes BOTH — the
  * retraction to the old group and the addition to the new one. Each
  * micro-batch reduces its ops to per-group deltas (one small shuffle on
  * grp), then the delta table full-outer-merges into the snapshot; groups
  * whose count reaches zero are dropped. Sums accumulate in
  * DECIMAL(28,10): exact, associative, replayable — a float total would
  * drift under retractions.
  *
  * Unlike latest-wins upsert (`CurrentState`), delta application is NOT
  * idempotent, so foreachBatch replays after a crash must not re-apply:
  * the snapshot records the producing batch id inside its `_COMMIT` marker
  * and `merge` skips any batch at-or-below it — the standard
  * transactional-sink contract.
  *
  * At 100 TB: the base table never re-scans; per-batch work is
  * O(batch + |touched groups|), and the snapshot write IS the MERGE-INTO
  * shape — state hashes into buckets on grp and a batch physically
  * rewrites only its touched buckets ([[SnapshotStore.writeNextBucketed]]),
  * so bytes written per batch ∝ touched buckets. The delta reduction is
  * the same partial-aggregate shape Spark uses for the batch GROUP BY.
  */
object IncrementalAgg {

  private val dec = org.apache.spark.sql.types.DecimalType(28, 10)

  /** Reduce one batch of change rows to per-group deltas.
    *
    * Change row columns: `op` ('i'|'u'|'d'), `grp_old`, `amount_old`
    * (null for inserts), `grp_new`, `amount_new` (null for deletes). */
  def deltas(ops: DataFrame): DataFrame = {
    val retract = ops.filter(col("op").isin("u", "d"))
      .select(col("grp_old").as("grp"), lit(-1L).as("dn"),
        (-col("amount_old")).cast(dec).as("dsum"))
    val add = ops.filter(col("op").isin("i", "u"))
      .select(col("grp_new").as("grp"), lit(1L).as("dn"),
        col("amount_new").cast(dec).as("dsum"))
    retract.unionByName(add)
      .groupBy("grp")
      .agg(sum(col("dn")).as("dn"), sum(col("dsum")).as("dsum"))
  }

  /** The per-batch merge FRAME — the full-outer delta application, exposed
    * as a seam so StreamShapeSpec can assert the plan's shape (leaves =
    * snapshot + batch only, one join, no window): the exact frame `merge`
    * writes. */
  private[streaming] def mergedFrame(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur match {
      case Some(cur) =>
        // null-SAFE join key: groupBy puts all NULL grp rows in ONE
        // group, so the merge must too — a plain equi-join never matches
        // the snapshot's NULL row and the NULL group would accumulate a
        // duplicate row per batch, diverging from the batch GROUP BY
        cur.as("c").join(d.as("d"), col("c.grp") <=> col("d.grp"), "full_outer")
          .select(coalesce(col("c.grp"), col("d.grp")).as("grp"),
            (coalesce(col("c.n"), lit(0L)) + coalesce(col("d.dn"), lit(0L))).as("n"),
            (coalesce(col("c.total"), lit(0L).cast(dec)) +
              coalesce(col("d.dsum"), lit(0L).cast(dec))).cast(dec).as("total"))
      case None =>
        d.select(col("grp"), col("dn").as("n"), col("dsum").cast(dec).as("total"))
    }

  /** Apply one batch's deltas to the snapshot at `stateRoot`. Skips
    * batches already applied (exactly-once under foreachBatch replay). */
  def merge(ops: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = ops.sparkSession
    import graft.GraftSession.MaterializeOps
    val d = deltas(ops).materialized
    // read-pruned MERGE INTO: the delta's groups pick their buckets, the
    // full-outer merge reads ONLY those buckets' snapshot rows (cohabiting
    // untouched groups pass through with null delta), and the write
    // materializes only those buckets
    val buckets = SnapshotStore.bucketsFor(spark, Seq("grp"))
    val tb = SnapshotStore.bucketIds(d.select("grp"), buckets)
    val merged = mergedFrame(
      SnapshotStore.readTouched(spark, stateRoot, buckets, tb), d)
    SnapshotStore.writeNextBuckets(merged.filter(col("n") =!= 0L), stateRoot,
      Some(batchId), buckets, Some(tb))
  }

  /** Start the streaming maintainer over a change stream with the
    * `deltas` column contract. */
  def start(ops: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    ops.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** Read the maintained view (grp, n, total). */
  def read(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot)
}
