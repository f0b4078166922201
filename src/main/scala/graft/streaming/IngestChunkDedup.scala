package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time CHUNK-level dedup — the streaming twin of batch t26.
  *
  * Document-level gates (IngestDedup tiles, IngestNearDup MinHash) miss
  * the t26 failure mode: an arriving document that is mostly fresh but
  * carries a verbatim repeated PASSAGE — a license block, boilerplate,
  * a syndicated paragraph — that the corpus already holds. The chunk
  * gate asks the question chunk-level training dedup acts on: of this
  * arrival's 64-token/stride-48 windows (`TextOps.chunkStructs` — THE
  * t26 chunk definition, factored so stream and batch agree
  * bit-for-bit), how many already occur verbatim in the corpus?
  *
  * Streaming semantics: identical envelope to IngestDedup — the
  * stream-static join is STATELESS (each micro-batch probes the static
  * corpus chunk index independently; no watermark, no state store), the
  * only stateful operator is the per-doc aggregate, and a document's
  * chunks all arrive in its one input row, so every doc_id completes
  * within its micro-batch and update mode emits each verdict exactly
  * once. At 100 TB the static side is the distinct corpus chunk-hash
  * index (16-byte keys, ~n_tokens/48 per corpus doc); Spark re-plans
  * the join per micro-batch, so broadcast/Bloom prefilters apply
  * unchanged.
  *
  * Alignment contract (what "verbatim" means here): a chunk matches only
  * when the arrival's 64-token window hashes identically, i.e. the copy
  * preserves the token grid — an exact document copy matches EVERY
  * chunk, a copy with an appended tail matches every chunk except the
  * boundary window (whose token count changes with n), and a pasted
  * passage matches where the grids align. Grid-breaking edits are the
  * span gate's job (`IngestSpanDedup` — positional K-grams, alignment-
  * free); the chunk gate is the cheap exact-window screen in front of
  * it, exactly as t26 is batch-side.
  */
object IngestChunkDedup {

  /** Static corpus side: the distinct chunk hashes of the existing
    * corpus — the first-occurrence key set t26's dup flag joins on. */
  def corpusIndex(corpusDocs: DataFrame): DataFrame =
    graft.analytics.TextOps.chunkStructs(corpusDocs)
      .select(explode(col("chunks")).as("c"))
      .select(col("c.h").as("ch")).distinct()

  /** Flag each arriving document: (doc_id, n_chunks, dup_chunks,
    * dup_frac, dup). `stream` needs (doc_id, text); emit in update mode.
    * EVERY arrival gets a verdict row — a document that tokenizes to
    * nothing (explode_outer keeps its null-chunk row) reports n_chunks=0
    * / dup=false rather than silently bypassing the gate. */
  def flagArrivals(stream: DataFrame, corpusChunks: DataFrame,
      minFrac: Double = 0.5): DataFrame =
    graft.analytics.TextOps.chunkStructs(stream)
      .select(col("doc_id"), explode_outer(col("chunks")).as("c"))
      .join(corpusChunks.withColumn("hit", lit(1L)),
        col("c.h") === col("ch"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("c")).as("n_chunks"), // counts non-null chunks only
        sum(coalesce(col("hit"), lit(0L))).as("dup_chunks"))
      .withColumn("dup_frac",
        when(col("n_chunks") === 0L, lit(0.0))
          .otherwise(col("dup_chunks").cast("double") / col("n_chunks")))
      .withColumn("dup", col("n_chunks") > 0L && col("dup_frac") >= minFrac)
}
