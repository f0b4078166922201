package graft.streaming

import graft.GraftSession.MaterializeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of the e27 regularized time-series view — the
  * hourly gap-fill + LOCF summary — under an arriving event stream.
  *
  * The key observation: the gap-fill GRID and the LOCF carry are pure
  * functions of the per-(user, hour) LAST-OBSERVATION table (`obs`), and
  * `obs` is a latest-wins upsert keyed (user_id, h) with a total
  * arrival-independent order (the `(us, event_id)` struct, the same
  * tie-break the batch query uses). So the stream maintains `obs`
  * with a tiny idempotent merge, and rebuilds the span-bounded summary
  * only for the users a batch touched — never re-scanning the event
  * stream and never recomputing an untouched user.
  *
  * Per-batch work is O(batch + touched_users × span_hours):
  *  - `deltas` reduces the batch to per-(user, h) last observations — one
  *    map-side-combinable hash-agg over the batch only;
  *  - `merge` full-outer-joins the delta into the obs snapshot on
  *    (user_id, h), keeping the greater `ord` — commutative, associative,
  *    idempotent, so ANY batch split (including replays of unsplittable
  *    event groups) converges to the same snapshot;
  *  - `mergedView` recomputes the e27 summary ONLY for touched users
  *    (their obs rows are span-bounded: ≤ corpus-duration hours each) and
  *    unions the previous view's untouched rows — the c06 touched-set
  *    contract, with the touched user set broadcast by construction
  *    (bounded by the batch's distinct users).
  *
  * Exactly-once under foreachBatch replay: the snapshot records the
  * producing batch id (`SnapshotStore` `_COMMIT`); `merge` skips any
  * batch at-or-below it. A replay that DOES slip through (e.g. the
  * recovered-batch path re-delivering the same events) is still safe:
  * greater-ord merge is idempotent.
  *
  * At 100 TB: obs is the only corpus-scaled state and it is SMALLER than
  * the stream (one row per user-hour); the summary rebuild touches
  * users × 720 rows per batch. Both stores bucket on user_id and a batch
  * physically writes only its touched users' buckets
  * ([[SnapshotStore.writeNextBucketed]]) — the MERGE-INTO write shape; a
  * transactional table format would additionally prune the untouched
  * buckets from the read.
  */
object IncrementalGapFill {

  /** Reduce one event batch (user_id, ts, event_id, value) to its
    * per-(user, hour) last observation. A NULL-valued event is NOT an
    * observation — the batch query's contract (it neither opens a carry
    * span nor counts as observed).
    *
    * Non-negative domain GUARD: hour bucketing uses integer `div`
    * (truncates toward zero) where the e27 oracle's `//` floors, and the
    * (us, event_id) struct order matches the batch query's printf order
    * only for non-negative fields — both agree exactly on us ≥ 0 ∧
    * event_id ≥ 0 and silently diverge below zero. Pre-epoch timestamps
    * and negative event ids are outside every producer's domain here, so
    * the guard filters them at the source rather than letting the three
    * formulations drift apart. */
  def deltas(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .filter(expr("unix_micros(ts) >= 0") && col("event_id") >= 0)
      .select(col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        // struct ordering of the non-negative (us, event_id) pair — the
        // same arrival-independent total order as the batch query's
        struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"))
          .as("ord"),
        col("value"))
      .groupBy("user_id", "h")
      .agg(max_by(col("value"), col("ord")).as("vlast"), max(col("ord")).as("ord"))

  /** Latest-wins merge of a delta obs table into the snapshot — the frame
    * `merge` writes, exposed for plan-shape assertions (leaves = snapshot +
    * delta only, one join, no window). */
  private[streaming] def mergedObs(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur match {
      case Some(cur) =>
        cur.as("c").join(d.as("d"),
            col("c.user_id") === col("d.user_id") && col("c.h") === col("d.h"),
            "full_outer")
          .select(
            coalesce(col("c.user_id"), col("d.user_id")).as("user_id"),
            coalesce(col("c.h"), col("d.h")).as("h"),
            when(col("d.ord").isNull || (col("c.ord").isNotNull &&
              col("c.ord") >= col("d.ord")), col("c.vlast"))
              .otherwise(col("d.vlast")).as("vlast"),
            greatestOrd(col("c.ord"), col("d.ord")).as("ord"))
      case None => d
    }

  private def greatestOrd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    when(a.isNull, b).when(b.isNull, a).when(a >= b, a).otherwise(b)

  /** Lazy read-side migration: an obs snapshot persisted by the original
    * format ("%020d%020d" string ord) upgrades to the struct ord on read —
    * the zero-padded fields parse back exactly, so restart continuity holds
    * across the layout change instead of crashing on a string-vs-struct
    * join comparison. */
  private def upgraded(obs: DataFrame): DataFrame =
    if (obs.schema("ord").dataType == org.apache.spark.sql.types.StringType)
      obs.withColumn("ord", struct(
        substring(col("ord"), 1, 20).cast("long").as("us"),
        substring(col("ord"), 21, 20).cast("long").as("eid")))
    else obs

  /** The e27 summary over an obs table restricted to `users` (None = all),
    * in the batch query's span-explode formulation: one lead() per user
    * over the OBSERVED hours (the grid runs [first obs, last obs], so each
    * grid hour's LOCF source is the observation opening its span), then
    * sequence(h, nexth-1) exploded with the fill value riding the span.
    * Bounded: |users| × span_hours rows before the final per-user agg,
    * and the windowed relation is the observed table, not the dense grid. */
  def summarize(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
    obs.select("user_id", "h", "vlast")
      .withColumn("nexth", lead(col("h"), 1).over(w))
      .select(col("user_id"), col("h"), col("vlast"),
        explode(sequence(col("h"),
          coalesce(col("nexth") - 1, col("h")))).as("gh"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_hours"),
        count(when(col("gh") === col("h"), 1)).as("n_observed"),
        (count(lit(1)) - count(when(col("gh") === col("h"), 1))).as("n_carried"),
        max(col("gh") - col("h")).as("max_carry_age"),
        sum(round(col("vlast") * 100).cast("long")).as("cents_filled"))
  }

  /** Touched-users-only view update: recompute the summary for the users
    * in `touched` from the merged obs, keep every other user's previous
    * summary row unchanged. `touched` is batch-bounded — broadcast it. */
  private[streaming] def mergedView(prevView: Option[DataFrame], obs: DataFrame,
      touched: DataFrame): DataFrame = {
    val fresh = summarize(
      obs.join(broadcast(touched), Seq("user_id"), "left_semi"))
    prevView match {
      case Some(pv) =>
        pv.join(broadcast(touched), Seq("user_id"), "left_anti")
          .unionByName(fresh)
      case None => fresh
    }
  }

  /** Apply one event batch: merge obs, rebuild the view for touched users.
    * Skips batches already applied (foreachBatch replay contract). */
  def merge(events: DataFrame, batchId: Long, stateRoot: String): Unit = {
    val obsRoot = s"$stateRoot/obs"
    val viewRoot = s"$stateRoot/view"
    // Commit order: obs first, view LAST — so the replay gate reads the
    // VIEW's batch id. A crash between the two writes leaves obs ahead of
    // view; the replay then re-merges the batch into obs (safe: greater-ord
    // merge is idempotent) and completes the missing view update. Gating on
    // obsRoot would skip the replay and leave the view stale forever.
    if (batchId <= SnapshotStore.lastBatchId(viewRoot)) return // replay
    val spark = events.sparkSession
    val d = deltas(events).materialized
    val touched = d.select("user_id").distinct().materialized
    // both stores bucket on user_id (not the full (user_id, h) obs key):
    // a user's rows co-locate in one bucket, so the batch READS and
    // REWRITES only the touched users' buckets in obs AND view — the
    // manifest carries every other bucket forward untouched, and the
    // touched-user recompute below scans exactly those buckets (the
    // partition-pruned lookup of a MERGE INTO)
    val buckets = SnapshotStore.bucketsFor(spark, Seq("user_id"))
    val tb = SnapshotStore.bucketIds(touched, buckets)
    val obs = mergedObs(
      SnapshotStore.readTouched(spark, obsRoot, buckets, tb).map(upgraded), d)
    SnapshotStore.writeNextBuckets(obs, obsRoot, Some(batchId), buckets, Some(tb))
    val obsNow = SnapshotStore.readTouched(spark, obsRoot, buckets, tb).get
    val view = mergedView(
      SnapshotStore.readTouched(spark, viewRoot, buckets, tb), obsNow, touched)
    SnapshotStore.writeNextBuckets(view, viewRoot, Some(batchId), buckets, Some(tb))
  }

  /** Run the maintainer over a streaming (user_id, ts, event_id, value)
    * event frame. */
  def start(events: DataFrame, stateRoot: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** The maintained summary view (None before the first batch). */
  def view(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, s"$stateRoot/view")
}
