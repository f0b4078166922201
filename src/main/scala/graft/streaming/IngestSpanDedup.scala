package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time VERBATIM-COPY gate — the streaming twin of batch d20
  * (duplicated-substring spans), the way [[IngestNearDup]] twins d03 and
  * [[IngestDedup]] twins d09/d10.
  *
  * The signal the other gates don't give: how much of an ARRIVING document
  * is covered by contiguous word runs that already exist verbatim in the
  * corpus — localized substring containment, not whole-doc similarity. A
  * doc that pastes two corpus paragraphs into fresh text sails through
  * Jaccard (low set overlap) and tiles (block alignment) but lights up
  * here: every K-token gram inside the pasted runs hits the corpus gram
  * index, the hits union into maximal spans, and span_ratio says exactly
  * what fraction of the arrival is copied.
  *
  * Dataflow per micro-batch (against a STATIC corpus side):
  *  1. arrival text → positional K-grams — bit-for-bit the batch d20
  *     definition (`Dedup.posGramsOf`, shared constant K);
  *  2. gram hashes left-semi join the corpus gram index — the only
  *     corpus-wide contact, a fixed-width hash-key join (the d03/tile
  *     shape that survives 100×); work ∝ batch grams, never corpus×batch;
  *  3. corpus-present grams explode to their K covered offsets, union into
  *     maximal spans per arrival (`Dedup.spanStats` — per-doc window,
  *     bounded by doc length);
  *  4. one verdict row per arriving doc: span_tokens, n_spans, span_ratio,
  *     and the boolean gate (a doc too short to gram reports zeros rather
  *     than silently bypassing).
  *
  * Like the sibling gates this is a pure batch function driven from
  * `foreachBatch`: the corpus side is built once (`corpusIndex`), persisted
  * by the caller, and at 100 TB is the shared dedup-gram table every
  * ingest job mounts — distinct md5 keys, so it is bounded by corpus gram
  * VOCABULARY, not corpus size, and only ever probed by hash.
  */
object IngestSpanDedup {

  /** Static corpus side: the DISTINCT positional-gram hashes of the corpus
    * (gh). Distinct — the gate asks "does this gram exist in the corpus",
    * not "how often" — which also makes the index idempotent under corpus
    * re-ingestion. Caller persists/checkpoints. */
  def corpusIndex(corpusDocs: DataFrame): DataFrame =
    graft.analytics.Dedup.posGramsOf(corpusDocs).select(col("gh")).distinct()

  /** Flag one batch of arrivals (doc_id, text) against the corpus gram
    * index. Every arrival gets a verdict row. */
  def flagBatch(arrivals: DataFrame, corpusGrams: DataFrame,
      maxSpanRatio: Double = 0.5): DataFrame = {
    val grams = graft.analytics.Dedup.posGramsOf(arrivals)
    val hits = grams.join(corpusGrams, Seq("gh"), "left_semi")
    val stats = graft.analytics.Dedup.spanStats(hits)
    graft.analytics.Dedup.tokenCounts(arrivals)
      .join(stats, Seq("doc_id"), "left")
      .na.fill(0L, Seq("span_tokens", "n_spans"))
      .withColumn("span_ratio", col("span_tokens").cast("double") /
        greatest(col("n_tokens"), lit(1L)).cast("double"))
      .withColumn("spandup", col("span_ratio") >= maxSpanRatio)
  }

  /** Run the gate over a stream of (doc_id, text): each micro-batch is
    * flagged against the static corpus side and handed to `sink`. */
  def start(stream: DataFrame, corpusGrams: DataFrame, checkpoint: String,
      maxSpanRatio: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusGrams, maxSpanRatio), id)
      }
      .start()
}
