package graft.streaming

import graft.GraftSession.MaterializeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time MEDIA near-duplicate gate — the multimodal member of the
  * ingest family ([[IngestDedup]] exact text, [[IngestNearDup]] MinHash
  * text, [[IngestSemDedup]] embeddings, [[IngestSpanDedup]] spans): each
  * ARRIVING media payload (opaque binary + real codec) is fingerprinted
  * with the 64-bit DCT pHash ([[graft.analytics.ImageCodec.phash64]]),
  * banded into 4×16-bit bands, and checked against the persisted corpus
  * band index; band-colliding candidates verify by exact Hamming distance
  * on the full fingerprint — the m05 verify-before-emit contract, so the
  * flag means "truly ≤ maxHamming against some existing image".
  *
  * Scale shape, per micro-batch (all contact against STATIC sides):
  *  1. decode + hash is a per-row kernel inside the batch — CPU ∝ batch
  *     bytes, no shuffle; the corpus is NEVER re-decoded (its fingerprints
  *     are the persisted index — at 100 TB the index is 12 bytes/image
  *     where the payloads are KBs–MBs, the whole point of fingerprinting
  *     at ingest);
  *  2. the only corpus-wide contact is the band equi-join on fixed-width
  *     hash keys (the m05/d03 shape);
  *  3. Hamming verify work ∝ |candidates|, one integer xor/popcount per
  *     pair — never corpus × batch.
  *
  * Hamming ≤ 3 with 4 bands of 16 bits has ZERO banding recall loss
  * (pigeonhole: ≤3 flipped bits cannot dirty all 4 bands), so unlike the
  * MinHash gate there is no probabilistic-recall caveat at the default
  * threshold. Like the other ingest gates this is a pure batch function
  * (`flagBatch`) driven from `foreachBatch` — each crawl increment gates
  * independently against the shared index.
  */
object IngestMediaDedup {

  /** Corpus side: (image_id, h, b0..b3) from (image_id, payload) — built
    * once, persisted/written by the caller; the per-image decode happens
    * exactly once, here. */
  def corpusIndex(corpus: DataFrame): DataFrame =
    withBands(corpus.select(col("image_id"),
      phashUdf(col("payload")).as("h")))

  private val phashUdf =
    udf((b: Array[Byte]) => graft.analytics.ImageCodec.phash64(b))

  private def withBands(withHash: DataFrame): DataFrame =
    withHash.select(Seq(col("image_id"), col("h")) ++
      (0 until 4).map(k =>
        // Mask, not `% 65536`: Spark's % keeps the dividend's sign, so a
        // fingerprint with bit 63 set would get a NEGATIVE band-3 residue
        // and never collide with an equal-band positive one. phash64 pins
        // bit 63 to 0 today, but the gate must stay correct for any
        // 64-bit fingerprint source.
        shiftrightunsigned(col("h"), k * 16).bitwiseAND(lit(0xFFFFL)).as(s"b$k")): _*)

  /** Flag one batch of arrivals (image_id, payload) against the corpus
    * index. Every arrival gets a verdict row: candidate count, verified
    * near-dup count, the nearest existing image (min Hamming, ties to the
    * smallest id), and the boolean gate. */
  private def hashedArrivals(arrivals: DataFrame): DataFrame =
    withBands(arrivals.select(col("image_id"), phashUdf(col("payload")).as("h")))
      .withColumnRenamed("image_id", "new_id")
      .withColumnRenamed("h", "hn")

  private def candidates(arr: DataFrame, corpusIdx: DataFrame): DataFrame = {
    val corpus = corpusIdx
      .withColumnRenamed("image_id", "corpus_id")
      .withColumnRenamed("h", "hc")
    def band(k: Int) = arr.select(col("new_id"), col("hn"), col(s"b$k").as("bh"))
      .join(corpus.select(col("corpus_id"), col("hc"), col(s"b$k").as("bh")), "bh")
      .select(col("new_id"), col("hn"), col("corpus_id"), col("hc"))
    (0 until 4).map(band).reduce(_ unionAll _).distinct()
      .withColumn("hamming", bit_count(col("hn").bitwiseXOR(col("hc"))).cast("long"))
  }

  private def verdicts(arrivals: DataFrame, cands: DataFrame,
      maxHamming: Int): DataFrame = {
    val verified = cands.filter(col("hamming") <= maxHamming)
    arrivals.select(col("image_id")).distinct()
      .join(cands.groupBy(col("new_id").as("image_id"))
        .agg(count(lit(1)).as("n_candidates")), Seq("image_id"), "left")
      .join(verified.groupBy(col("new_id").as("image_id")).agg(
        count(lit(1)).as("n_neardups"),
        // nearest existing image: min Hamming, ties to smallest id —
        // sort-free max(struct) with negated fields
        min(struct(col("hamming"), col("corpus_id"))).getField("corpus_id")
          .as("nearest_image")), Seq("image_id"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_neardups", coalesce(col("n_neardups"), lit(0L)))
      .withColumn("neardup", col("n_neardups") > 0L)
  }

  /** The verdict as a PURE PLAN (no caching, no materialization) — what
    * the scale-shape spec inspects: corpus contact only via the index. */
  def flagPlan(arrivals: DataFrame, corpusIdx: DataFrame,
      maxHamming: Int = 3): DataFrame =
    verdicts(arrivals, candidates(hashedArrivals(arrivals), corpusIdx), maxHamming)

  def flagBatch(arrivals: DataFrame, corpusIdx: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    // the hashed arrivals feed 4 band joins, and the candidate set feeds
    // two aggregates — without caching, each consumer re-runs the decode
    // + DCT lineage (~8 full decodes per payload per batch). Cache both,
    // materialize the batch-sized verdict (localCheckpoint cuts the
    // lineage), then drop the caches before handing the frame out.
    val arr = hashedArrivals(arrivals).persist()
    val cands = candidates(arr, corpusIdx).persist()
    try verdicts(arrivals, cands, maxHamming).materialized
    finally { arr.unpersist(); cands.unpersist() }
  }

  /** Run the gate over a stream of (image_id, payload): each micro-batch
    * is flagged against the static index and handed to `sink`. */
  def start(stream: DataFrame, corpusIdx: DataFrame, checkpoint: String,
      maxHamming: Int = 3)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusIdx, maxHamming), id)
      }
      .start()
}
