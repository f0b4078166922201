package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the q48 grouped quantile sketch — percentile
  * brackets kept live as fact rows arrive.
  *
  * The q48 sketch was CHOSEN to be mergeable (that is its whole design
  * argument: fixed log2 buckets, one map-side-combined histogram agg, no
  * sort), and mergeable means streamable for free: the maintained state
  * is the per-(group, bucket) count table — ≤64 rows per group at ANY
  * corpus size — and each arriving batch contributes its own histogram
  * by pure addition. After any prefix of the stream, `view` replays
  * q48's bracket math (cumulative over the ≤64-row per-group histogram,
  * threshold fan-out, min(struct) first-bucket pick) on the state and
  * reproduces the batch query over the same rows BIT-FOR-BIT
  * (IncrementalQuantileSpec) — counts are integers, so there is not even
  * a float to disagree about.
  *
  * Per-batch work: one batch-sized histogram agg + a ≤(groups×64)-row
  * union-merge. Exactly-once under foreachBatch replay is the
  * [[SnapshotStore]] batch-id contract shared with the other maintainers.
  */
object IncrementalQuantile {

  /** One batch of `(grp, value)` rows (value: double, bucketed on
    * floor(value·100) cents like q48) → per-(grp, blen) count deltas. */
  def deltas(batch: DataFrame): DataFrame =
    batch
      .select(col("grp"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("blen", length(bin(col("cents"))).cast("int"))
      .groupBy("grp", "blen")
      .agg(count(lit(1)).as("n_rows"))

  /** Snapshot ∪ deltas summed on (grp, blen) — pure additive union. */
  private[streaming] def mergedFrame(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur.fold(d)(_.unionByName(d))
      .groupBy("grp", "blen")
      .agg(sum("n_rows").as("n_rows"))

  /** Apply one batch to the state at `stateRoot`; replayed batches are
    * skipped by batch id (exactly-once). */
  def merge(batch: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = batch.sparkSession
    // sketch-sized state: full rewrite IS the right physical write here
    // (a bucketed manifest would save no bytes on O(sketch) rows)
    SnapshotStore.writeNext(
      mergedFrame(SnapshotStore.read(spark, stateRoot), deltas(batch)),
      stateRoot, Some(batchId))
  }

  /** Start the streaming maintainer over a `(grp, value)` stream. */
  def start(rows: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** The maintained quantile view: q48's bracket math over the state
    * histogram — (grp, p, bucket, bucket_lo, bucket_hi, n_total) for
    * p ∈ {50, 90, 99}. The windows partition by grp over the ≤64-row
    * per-group histogram, exactly as the batch query's do. */
  def view(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot).map { st =>
      val cum = Window.partitionBy(col("grp")).orderBy(col("blen"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.partitionBy(col("grp"))
      st
        .withColumn("cum", sum(col("n_rows")).over(cum))
        .withColumn("n", sum(col("n_rows")).over(all))
        .withColumn("p", explode(array(lit(50L), lit(90L), lit(99L))))
        .filter(col("cum") * 100L >= col("p") * col("n"))
        .groupBy(col("grp"), col("p"))
        .agg(min(struct(col("blen"), col("n"))).as("m"))
        .select(col("grp"), col("p"),
          col("m.blen").as("bucket"),
          expr("shiftleft(1L, m.blen - 1)").as("bucket_lo"),
          expr("shiftleft(1L, m.blen) - 1L").as("bucket_hi"),
          col("m.n").as("n_total"))
    }
}
