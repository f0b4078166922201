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
  * At production scale the same shape targets a transactional table format
  * (MERGE INTO on Delta/Iceberg) instead of snapshot rewrite; the streaming
  * plumbing — append stream, foreachBatch boundary, per-key
  * latest-wins resolution — is identical.
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

  private def versionDirs(stateRoot: String): Seq[(Long, java.io.File)] = {
    val d = new java.io.File(stateRoot)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(f => f.getName.stripPrefix("v=").toLong -> f)
      .sortBy(_._1)
  }

  /** A version is current only once its _SUCCESS marker exists — a crash
    * mid-write leaves a partial v=N dir (e.g. only _temporary) that must
    * never be treated as the snapshot, or the next merge would union
    * against empty/corrupt state and silently lose rows. */
  private def isComplete(dir: java.io.File): Boolean =
    new java.io.File(dir, "_SUCCESS").isFile

  private def versions(stateRoot: String): Seq[Long] =
    versionDirs(stateRoot).collect { case (v, f) if isComplete(f) => v }

  /** Read the current (= highest COMPLETE) snapshot, if any. */
  def read(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    versions(stateRoot).lastOption.map(v => spark.read.parquet(s"$stateRoot/v=$v"))

  /** Merge one batch of change rows (user_id, event_id, event_type, us,
    * value) into the snapshot. Exposed for direct (batch) use and reused by
    * the streaming writer. */
  def merge(batch: DataFrame, stateRoot: String): Unit = {
    val spark = batch.sparkSession
    val keyed = batch.select("user_id", "event_id", "event_type", "us", "value")
    val merged = read(spark, stateRoot) match {
      case Some(cur) => latestPerKey(cur.unionByName(keyed))
      case None => latestPerKey(keyed)
    }
    // next version must clear ALL existing dirs (complete or partial) so a
    // crashed partial write is overwritten, never re-numbered around
    val next = versionDirs(stateRoot).lastOption.map(_._1).getOrElse(0L) + 1
    merged.write.mode("overwrite").parquet(s"$stateRoot/v=$next")
    // Retention: keep the two highest COMPLETE versions (current + the
    // crash-recovery fallback); everything else — older completes and any
    // partial leftovers — is deleted. The last complete snapshot can never
    // be deleted: the version just written is complete, so it and its
    // predecessor are always in `keep`.
    val keep = versions(stateRoot).takeRight(2).toSet
    versionDirs(stateRoot).filterNot { case (v, _) => keep(v) }.foreach { case (_, dir) =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
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
