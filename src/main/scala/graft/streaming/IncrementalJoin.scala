package graft.streaming

import graft.GraftSession.MaterializeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally maintained equi-JOIN view over two CDC changelogs — the
  * piece Structured Streaming's stream-stream join does not cover: its
  * join buffers APPEND-only sides, so an upstream UPDATE or DELETE can
  * never retract a previously joined row. A CDC changelog is exactly
  * updates+deletes, so the maintained join must be symmetric and
  * retraction-aware (the Flink/Materialize semantics): when either side's
  * row for a key changes, the old joined row leaves the view and the new
  * one (if both sides are live) enters it.
  *
  * Input batches carry both sides tagged: (side 'L'|'R', user_id,
  * event_id, us, value). Latest-wins per (side, key) — W1's strong total
  * order per key makes the (us, event_id) max the current row — and a
  * change with value < 1.0 is the tombstone encoding used by the batch
  * twin (c06, `analytics/CdcQueries`): the side's row for that key is
  * ABSENT. The maintained view is the inner join L ⋈ R on the key.
  *
  * Per batch, everything is batch-sized except three key-joins against
  * snapshots: the touched-key set (≤ batch rows, broadcastable) anti/semi
  * joins each side snapshot and the view. Each store buckets on user_id
  * and its write materializes only the touched keys' buckets
  * ([[SnapshotStore.writeNextBucketed]]) — the MERGE-INTO write shape; a
  * transactional table format would additionally prune the untouched
  * majority from the read. The join that produces new view
  * rows runs only over the touched keys' rows of each side, never
  * snapshot × snapshot. Alongside the view, each batch emits a CHANGELOG
  * (op '+'/'-') so downstream consumers can themselves be incremental —
  * the view is exactly the running application of its own changelog
  * (IncrementalJoinSpec locks this).
  *
  * Exactly-once: the view store's batch id is the gate; side snapshots
  * and the changelog commit BEFORE the view, and every per-batch merge is
  * idempotent (touched keys are REPLACED by values derived only from the
  * batch, untouched keys pass through), so a crash-replay that finds the
  * side stores already merged re-derives the identical frames and the
  * identical changelog from the same pre-batch view base.
  */
object IncrementalJoin {

  private def lRoot(root: String) = s"$root/left"
  private def rRoot(root: String) = s"$root/right"
  private def vRoot(root: String) = s"$root/view"

  /** Latest change per (side, key) in this batch — the batch's net effect
    * under the per-key total order. */
  private[streaming] def latestPerKey(changes: DataFrame): DataFrame =
    changes.groupBy(col("side"), col("user_id"))
      .agg(max(struct(col("us"), col("event_id"), col("value"))).as("m"))
      .select(col("side"), col("user_id"), col("m.event_id").as("event_id"),
        col("m.us").as("us"), col("m.value").as("value"))

  /** Replace touched keys in one side's snapshot; value < 1.0 deletes. */
  private[streaming] def mergeSide(cur: Option[DataFrame], latest: DataFrame): DataFrame = {
    val live = latest.filter(col("value") >= 1.0)
      .select("user_id", "event_id", "us", "value")
    cur match {
      case None => live
      case Some(c) =>
        c.join(latest.select("user_id"), Seq("user_id"), "left_anti")
          .unionByName(live)
    }
  }

  private def joined(l: DataFrame, r: DataFrame): DataFrame =
    l.select(col("user_id"), col("event_id").as("l_event_id"), col("value").as("l_value"))
      .join(r.select(col("user_id"), col("event_id").as("r_event_id"),
        col("value").as("r_value")), Seq("user_id"))

  /** The per-batch frames, LAZY (no checkpoints) — the seam
    * IncrementalJoinShapeSpec inspects: every contact with a snapshot
    * (side or view) must go through a join against the broadcastable
    * touched-key set; the only side-to-side join runs over the touched
    * keys' rows. Returns (newL, newR, changelog, newView). */
  private[streaming] def mergedFrames(
      curL: Option[DataFrame], curR: Option[DataFrame], oldView: Option[DataFrame],
      latest: DataFrame, touched: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val newL = mergeSide(curL, latest.filter(col("side") === "L"))
    val newR = mergeSide(curR, latest.filter(col("side") === "R"))
    val (changelog, newView) = viewFrames(oldView, newL, newR, touched)
    (newL, newR, changelog, newView)
  }

  /** Changelog + next view from the (merged) sides and the old view. */
  private def viewFrames(
      oldView: Option[DataFrame], newL: DataFrame, newR: DataFrame,
      touched: DataFrame): (DataFrame, DataFrame) = {
    // new view rows for the touched keys only: each side filtered to the
    // (broadcastable) touched set, then joined — never snapshot×snapshot
    val newTouched = joined(
      newL.join(broadcast(touched), Seq("user_id"), "left_semi"),
      newR.join(broadcast(touched), Seq("user_id"), "left_semi"))
    val viewCols = Seq("user_id", "l_event_id", "l_value", "r_event_id", "r_value")
    // canonical column order before exceptAll (positional semantics)
    val oldTouched = (oldView match {
      case None => newTouched.limit(0)
      case Some(v) => v.join(broadcast(touched), Seq("user_id"), "left_semi")
    }).select(viewCols.map(col): _*)
    val newTouchedC = newTouched.select(viewCols.map(col): _*)
    val changelog =
      oldTouched.exceptAll(newTouchedC).withColumn("op", lit("-"))
        .unionByName(newTouchedC.exceptAll(oldTouched).withColumn("op", lit("+")))
        .select("op", "user_id", "l_event_id", "l_value", "r_event_id", "r_value")
    val newView = oldView match {
      case None => newTouched
      case Some(v) =>
        v.join(broadcast(touched), Seq("user_id"), "left_anti").unionByName(newTouched)
    }
    (changelog, newView)
  }

  /** Apply one batch of tagged changes. Returns the batch's view
    * changelog (op, user_id, l_event_id, l_value, r_event_id, r_value);
    * replayed batch ids return None. */
  def merge(changes: DataFrame, batchId: Long, stateRoot: String): Option[DataFrame] = {
    if (batchId <= SnapshotStore.lastBatchId(vRoot(stateRoot))) return None // replay
    val spark = changes.sparkSession
    val latest = latestPerKey(changes).materialized
    val touched = latest.select("user_id").distinct().materialized
    // All three stores bucket on user_id and every snapshot contact is
    // READ-pruned to the touched keys' buckets: the side merges, the old
    // view's anti-join carry, and the touched-key join inputs only ever
    // see those buckets' rows — per-batch cost ∝ touched buckets end to
    // end, untouched buckets ride the manifest unread and unwritten.
    val buckets = SnapshotStore.bucketsFor(spark, Seq("user_id"))
    val tb = SnapshotStore.bucketIds(touched, buckets)
    // sides materialize first so the view/changelog plans read the
    // checkpointed frames instead of re-deriving the side merges
    val newL = mergeSide(SnapshotStore.readTouched(spark, lRoot(stateRoot), buckets, tb),
      latest.filter(col("side") === "L")).materialized
    val newR = mergeSide(SnapshotStore.readTouched(spark, rRoot(stateRoot), buckets, tb),
      latest.filter(col("side") === "R")).materialized
    val (changelog0, newView0) = viewFrames(
      SnapshotStore.readTouched(spark, vRoot(stateRoot), buckets, tb), newL, newR, touched)
    val changelog = changelog0.materialized
    val newView = newView0.materialized

    // commit order: sides first, view LAST — its batch id is the gate
    SnapshotStore.writeNextBuckets(newL, lRoot(stateRoot), Some(batchId),
      buckets, Some(tb))
    SnapshotStore.writeNextBuckets(newR, rRoot(stateRoot), Some(batchId),
      buckets, Some(tb))
    SnapshotStore.writeNextBuckets(newView, vRoot(stateRoot), Some(batchId),
      buckets, Some(tb))
    Some(changelog)
  }

  /** Start the streaming maintainer; `changes` columns: side, user_id,
    * event_id, us, value. Per-batch changelogs land under
    * `<stateRoot>/changelog/batch=<id>`. */
  def start(changes: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        merge(batch, id, stateRoot).foreach(
          _.write.mode("overwrite").parquet(s"$stateRoot/changelog/batch=$id"))
      }
      .start()

  /** The maintained join view (user_id, l_event_id, l_value, r_event_id,
    * r_value). */
  def read(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, vRoot(stateRoot))
}
