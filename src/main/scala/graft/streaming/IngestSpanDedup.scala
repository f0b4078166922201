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

  /** The arrival-time span-dedup REWRITE — the streaming twin of batch
    * d23 the way `flagBatch` twins d20: tokens of an arriving doc covered
    * by any corpus-present K-gram are CUT (at arrival time the corpus
    * owns every first occurrence by definition — exactly d23's
    * keep-the-first rule with the corpus as the earlier owner), and the
    * surviving token stream is reconstructed per doc
    * (`Dedup.posTokensOf`/`rebuildKept` — the same definitions batch d23
    * rebuilds with, so stream and batch agree bit-for-bit). Within-batch
    * duplication is deliberately NOT cut here: the admitted batch joins
    * the corpus index afterwards, and the next batch's arrivals see it —
    * the same corpus-vs-increment contract as every sibling gate.
    * Output: one row per arrival (doc_id, n_tokens, kept_tokens,
    * cut_tokens, text_dedup). */
  def rewriteBatch(arrivals: DataFrame, corpusGrams: DataFrame): DataFrame = {
    val grams = graft.analytics.Dedup.posGramsOf(arrivals)
    val k = graft.analytics.Dedup.SPAN_K
    val cut = grams.join(corpusGrams, Seq("gh"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("pos").cast("long"),
        col("pos").cast("long") + (k - 1))).as("p"))
      .distinct()
    val kept = graft.analytics.Dedup.posTokensOf(arrivals)
      .join(cut, Seq("doc_id", "p"), "left_anti")
    graft.analytics.Dedup.tokenCounts(arrivals)
      .join(graft.analytics.Dedup.rebuildKept(kept), Seq("doc_id"), "left")
      .na.fill(0L, Seq("kept_tokens")).na.fill("", Seq("text_dedup"))
      .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
        (col("n_tokens") - col("kept_tokens")).as("cut_tokens"),
        col("text_dedup"))
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
