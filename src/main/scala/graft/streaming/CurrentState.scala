package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

/** Materialize an ordered change stream into a per-key current-state table —
  * the CDC sink's MERGE/upsert pattern (SURVEY.md §7 step 5; the batch twin
  * is c01_current_state). Each micro-batch is merged into a versioned
  * parquet snapshot via read-merge-write-new-version: the new version is
  * written BEFORE the pointer moves (the directory listing picks the
  * highest complete version), so a crash mid-merge leaves the previous
  * snapshot intact, and foreachBatch's committed-batch tracking makes
  * replays idempotent.
  *
  * The physical write is the bucketed MERGE-INTO shape: state hashes into
  * buckets on user_id and a batch rewrites only its touched buckets
  * ([[SnapshotStore.writeNextBucketed]]) — per-batch write cost is
  * ∝ touched buckets, not ∝ state. A production deployment swaps the
  * manifest store for a transactional table format (Delta/Iceberg MERGE
  * INTO) with the identical dataflow.
  */
object CurrentState {

  /** Latest-wins resolution: one row per user_id, ordered by (us, event_id). */
  private def latestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Read the current (= highest COMPLETE) snapshot, if any. Version
    * bookkeeping (the _COMMIT-gated v=N layout and retention) lives in
    * [[SnapshotStore]], shared with `IncrementalAgg`. */
  def read(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot)

  /** Merge one batch of change rows (user_id, event_id, event_type, us,
    * value) into the snapshot. Exposed for direct (batch) use and reused by
    * the streaming writer. Bucketed READ-pruned MERGE: the batch's user_ids
    * pick their buckets, the merge plan reads ONLY those buckets' snapshot
    * rows (cohabiting untouched keys ride through latest-wins unchanged),
    * and the write materializes only those buckets — per-batch cost is
    * ∝ touched buckets end to end; the manifest carries every other
    * bucket forward without reading OR writing it. */
  def merge(batch: DataFrame, stateRoot: String): Unit = {
    val spark = batch.sparkSession
    val buckets = SnapshotStore.bucketsFor(spark, Seq("user_id"))
    val tb = SnapshotStore.bucketIds(batch.select("user_id").distinct(), buckets)
    val cur = SnapshotStore.readTouched(spark, stateRoot, buckets, tb)
    SnapshotStore.writeNextBuckets(
      mergedFrame(cur, batch), stateRoot, None, buckets, Some(tb))
  }

  /** The per-batch merge FRAME — latest-wins over snapshot ∪ batch,
    * exposed as a seam so StreamShapeSpec can assert the plan's shape
    * (leaves = snapshot + batch only; the window is PARTITIONED by
    * user_id, never unpartitioned): the exact frame `merge` writes. */
  private[streaming] def mergedFrame(cur: Option[DataFrame], batch: DataFrame): DataFrame = {
    val keyed = batch.select("user_id", "event_id", "event_type", "us", "value")
    cur match {
      case Some(c) => latestPerKey(c.unionByName(keyed))
      case None => latestPerKey(keyed)
    }
  }

  /** Start the streaming materializer over an event stream with columns
    * (user_id, event_id, event_type, us, value). */
  def start(events: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => merge(batch, stateRoot) }
      .start()

  /** Streaming dedup twin of the restart filter (F3): drop re-delivered
    * events by event_id within the watermark horizon — bounded state, the
    * correct at-scale contract (an unbounded-horizon dedup would grow state
    * forever; re-deliveries beyond the horizon are the checkpoint's job). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
