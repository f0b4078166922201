package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of one k-means Lloyd step — the s18 batch query
  * (`Similarity` "s18_kmeans_step") kept LIVE as embeddings arrive.
  *
  * The key fact making this exact rather than approximate: with FIXED
  * seed centroids, one Lloyd iteration's update is fully additive.
  * Assignment is stateless (each vector's nearest seed depends only on
  * the vector and the broadcast seeds), and the centroid update needs
  * only the per-(centroid, dimension) running (Σvalue, count) —
  * commutative sums, so arrival order and batch boundaries cannot change
  * the result. The maintained state IS those sufficient statistics:
  * k×64 rows regardless of corpus size, the smallest state of any
  * incremental view here after IngestQuota's counters. After any prefix
  * of the stream, `view` reproduces BIT-FOR-BIT what the batch s18
  * query computes over the same rows (IncrementalKMeansSpec).
  *
  * Per-batch work: one k-way fused-SSD scan of the BATCH (not the
  * corpus), one 64-way posexplode hash-agg of the batch, and a k×64-row
  * union-merge with the state snapshot. The corpus is never re-scanned;
  * exactly-once under foreachBatch replay is the [[SnapshotStore]]
  * batch-id contract shared with IncrementalAgg/IncrementalMinMax.
  *
  * This is the dataflow of a streaming mini-batch k-means front end
  * (Sculley's web-scale k-means, with the learning-rate step replaced by
  * the exact sufficient-statistic sum): a production pipeline would
  * periodically promote `view`'s centroids to new seeds and reset state
  * — each such generation is one exact Lloyd step.
  */
object IncrementalKMeans {

  /** Quantize a float embedding to the engine's integer-exact domain —
    * the same round(x·2^20) contract the batch similarity family uses. */
  def quantize(e: Column): Column =
    transform(e, x => round(x.cast("double") * (1L << 20)).cast("long"))

  private def longSsd(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.LongSsd(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One batch of quantized vectors `(vec_id, q)` against broadcast seeds
    * `(cid, cq)` → per-(cid, pos) sufficient-statistic deltas
    * `(cid, pos, sv, n)`. Argmin is the sort-free min(struct), ties to
    * the smallest cid — identical to the batch s18 assignment. */
  def deltas(batch: DataFrame, cent: DataFrame): DataFrame =
    batch.crossJoin(broadcast(cent))
      .withColumn("ssd", longSsd(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("ssd"), col("cid"))).as("m"), first(col("q")).as("q"))
      .select(col("m.cid").as("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))

  /** The merge frame (seam for shape assertions): snapshot ∪ deltas
    * summed on (cid, pos) — no join, pure additive union, k×64 rows. */
  private[streaming] def mergedFrame(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur.fold(d)(_.unionByName(d))
      .groupBy("cid", "pos")
      .agg(sum("sv").as("sv"), sum("n").as("n"))

  /** Apply one batch's vectors to the state at `stateRoot`; replayed
    * batches are skipped by batch id (exactly-once). */
  def merge(batch: DataFrame, cent: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = batch.sparkSession
    // k×dim-sized state: full rewrite IS the right physical write here
    // (a bucketed manifest would save no bytes on O(k) rows)
    SnapshotStore.writeNext(
      mergedFrame(SnapshotStore.read(spark, stateRoot), deltas(batch, cent)),
      stateRoot, Some(batchId))
  }

  /** Start the streaming maintainer over an embedding stream. */
  def start(vecs: DataFrame, cent: DataFrame, stateRoot: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        merge(batch, cent, id, stateRoot)
      }
      .start()

  /** The maintained Lloyd-step view over everything arrived so far:
    * (cid, n_assigned, drift) — the batch s18 output shape, derived the
    * batch way (floored per-dim mean, exact BIGINT drift vs the seed). */
  def view(spark: SparkSession, stateRoot: String, cent: DataFrame): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot).map { st =>
      val newc = st.withColumn("m",
        floor(col("sv").cast("double") / col("n")).cast("long"))
      val centDims = cent.select(col("cid"), posexplode(col("cq")).as(Seq("pos", "cv")))
      newc.join(broadcast(centDims), Seq("cid", "pos"))
        .groupBy("cid")
        .agg(max(col("n")).as("n_assigned"),
          sum((col("m") - col("cv")) * (col("m") - col("cv"))).as("drift"))
    }
}
