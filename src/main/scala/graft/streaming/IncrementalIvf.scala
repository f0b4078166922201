package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the IVF assignment index — the s05 build kept
  * LIVE as embeddings arrive, under the FROZEN-QUANTIZER contract a
  * production ANN deployment actually runs: the coarse quantizer
  * (refined centroids) is trained offline and pinned between re-trains
  * (`Similarity.ivfCentroids`), so an arriving vector's cell depends
  * only on the vector and the broadcast centroids — assignment is
  * STATELESS per row, and maintenance is exactly delta-only:
  *
  *  - per batch: one batch×k broadcast argmax-cosine scan
  *    (`Similarity.assignVectors` — bit-identical to the batch build's
  *    assignment step, factored for precisely this reuse), then
  *  - the cell-count sufficient statistics merge additively (k rows at
  *    any corpus size — the balance view's only state), and
  *  - the batch's assignment rows land as an idempotent parquet delta
  *    under `assignDir/batch=<id>` (a replayed micro-batch sees its
  *    directory exists and skips — the write-once twin of
  *    [[SnapshotStore]]'s batch-id contract, without rewriting the
  *    corpus-sized table per batch).
  *
  * `balanceView` reproduces the s20 cell-balance audit (the re-train
  * signal) over everything arrived so far; `assignments` reads the delta
  * directories back as the full index — both parity-specced against the
  * batch forms on the same rows (IncrementalIvfSpec). When the audit
  * crosses its threshold, the operator re-trains offline, swaps the
  * frozen centroids, and resets state — each generation is one exact
  * batch build.
  */
object IncrementalIvf {

  /** Quantize + norm one batch of raw `(vec_id, embedding)` rows into the
    * assignment domain `(cid, qb, n2b)`. */
  def prepared(batch: DataFrame): DataFrame =
    graft.analytics.Similarity.quantizeNorm(batch)
      .select(col("vec_id").as("cid"), col("q").as("qb"), col("n2").as("n2b"))

  /** One batch against the frozen broadcast centroids → assignment rows
    * `(cid, cent_id)`. */
  def deltas(batch: DataFrame, cents: DataFrame): DataFrame =
    graft.analytics.Similarity.assignVectors(prepared(batch), cents)
      .select(col("cid"), col("cent_id"))

  /** Apply one micro-batch: write the assignment delta (idempotent by
    * batch directory) and merge the per-cell counts (additive). Write
    * completion is judged by the committer's `_SUCCESS` marker, not bare
    * directory existence — a crash mid-write leaves a partial
    * `batch=<id>` dir, and the replay must repair it (mode("overwrite")
    * clears the torn files), or the assignment index would silently miss
    * the batch the cell counts include. */
  def merge(batch: DataFrame, cents: DataFrame, batchId: Long,
      stateRoot: String): Unit = {
    val spark = batch.sparkSession
    val batchDir = java.nio.file.Paths.get(s"$stateRoot/assign/batch=$batchId")
    val deltaComplete = java.nio.file.Files.exists(batchDir.resolve("_SUCCESS"))
    if (batchId <= SnapshotStore.lastBatchId(s"$stateRoot/cells") &&
      deltaComplete) return // replayed batch
    val d = deltas(batch, cents).persist()
    try {
      if (!deltaComplete)
        d.write.mode("overwrite").parquet(batchDir.toString)
      if (batchId > SnapshotStore.lastBatchId(s"$stateRoot/cells")) {
        val counts = d.groupBy(col("cent_id")).agg(count(lit(1)).as("n_vectors"))
        val merged = SnapshotStore.read(spark, s"$stateRoot/cells")
          .fold(counts)(_.unionByName(counts)
            .groupBy(col("cent_id")).agg(sum(col("n_vectors")).as("n_vectors")))
        SnapshotStore.writeNext(merged, s"$stateRoot/cells", Some(batchId))
      }
    } finally d.unpersist()
  }

  /** The full maintained assignment index: union of the batch deltas —
    * empty (same schema) before the first batch lands, like
    * [[balanceView]]. */
  def assignments(spark: SparkSession, stateRoot: String): DataFrame =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stateRoot/assign")))
      spark.emptyDataFrame
        .select(lit(0L).as("cid"), lit(0L).as("cent_id")).limit(0)
    else spark.read.parquet(s"$stateRoot/assign")

  /** The live s20 cell-balance report over everything arrived so far —
    * cell-count-sized compute off the k-row state, never a corpus scan. */
  def balanceView(spark: SparkSession, stateRoot: String): DataFrame = {
    val counts = SnapshotStore.read(spark, s"$stateRoot/cells")
      .getOrElse(spark.emptyDataFrame.select(lit(0L).as("cent_id"),
        lit(0L).as("n_vectors")).limit(0))
    val total = counts.agg(sum(col("n_vectors")).as("total"),
      count(lit(1)).as("n_cells"))
    counts.crossJoin(broadcast(total))
      .select(col("cent_id"), col("n_vectors"),
        // decimal(38,0) intermediate — the bare Long product wraps at the
        // ~1e12-vector design point (see s20 in Similarity.scala)
        expr("cast(n_vectors as decimal(38,0)) * n_cells * 1000000 div total")
          .as("load_ppm_of_mean"))
      .orderBy(col("cent_id"))
  }

  /** Start the streaming maintainer over a raw embedding stream. */
  def start(vecs: DataFrame, cents: DataFrame, stateRoot: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        merge(batch, cents, id, stateRoot)
      }
      .start()
}
