package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time incremental dedup — the streaming twin of batch d10.
  *
  * A training-data pipeline doesn't re-dedup the whole corpus per crawl;
  * it checks each ARRIVING document against the existing corpus index.
  * That is a stream-static join: the new-document stream explodes into
  * tile hashes (`graft.analytics.Dedup.tileHashes` — the same tile
  * definition as the batch operator, so stream and batch agree
  * bit-for-bit), each tile left-joins the static corpus tile index, and a
  * per-document aggregate counts the matches.
  *
  * Streaming semantics: the stream-static join is STATELESS (each
  * micro-batch joins the static side independently — no watermark, no
  * state store); the only stateful operator is the per-doc_id aggregate,
  * and since a document's tiles all arrive in its one input row, every
  * doc_id is complete within its micro-batch — update mode emits each
  * document exactly once. At 100 TB the static side is the bucketed
  * corpus tile index; Spark re-plans the join per micro-batch, so a
  * broadcast hint (or the d10 Bloom prefilter) applies unchanged.
  */
object IngestDedup {

  /** Static corpus side: distinct tile hashes of the existing corpus. */
  def corpusIndex(corpusDocs: DataFrame): DataFrame =
    graft.analytics.Dedup.tileHashes(corpusDocs).select(col("th")).distinct()

  /** Flag each arriving document: (doc_id, n_tiles, matched_tiles,
    * matched_frac, dup). `stream` needs (doc_id, text); emit in update
    * mode (one final row per doc — each doc completes in its batch).
    * EVERY arrival gets a verdict row — a document below one tile of
    * normalized text (explode_outer keeps its null-tile row) reports
    * n_tiles=0 / dup=false rather than silently bypassing the gate; such
    * docs are below the operator's dedup granularity and a pipeline
    * routes them to an exact-hash check instead. */
  def flagArrivals(stream: DataFrame, corpusTiles: DataFrame,
      minFrac: Double = 0.5): DataFrame =
    graft.analytics.Dedup.tileArray(stream)
      .select(col("doc_id"), explode_outer(col("tiles")).as("th"))
      .join(corpusTiles.withColumn("hit", lit(1L)), Seq("th"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("th")).as("n_tiles"), // counts non-null tiles only
        sum(coalesce(col("hit"), lit(0L))).as("matched_tiles"))
      .withColumn("matched_frac",
        when(col("n_tiles") === 0L, lit(0.0))
          .otherwise(col("matched_tiles").cast("double") / col("n_tiles")))
      .withColumn("dup", col("n_tiles") > 0L && col("matched_frac") >= minFrac)
}
