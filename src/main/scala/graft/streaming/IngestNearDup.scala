package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time NEAR-duplicate gate — the streaming twin of batch d03
  * (MinHash+LSH), the way [[IngestDedup]] twins the exact tile operator
  * d09/d10.
  *
  * A training-data pipeline doesn't re-band the whole corpus per crawl; it
  * checks each ARRIVING document's band hashes against the existing corpus
  * band index, then verifies only the colliding pairs with exact Jaccard —
  * d03's verify-before-emit contract, so precision is 1.0 by construction
  * and the flag means "truly ≥ minJaccard against some existing doc".
  *
  * Dataflow per micro-batch (all against STATIC corpus sides):
  *  1. arrival text → shingles → 16-lane signature → 4 band hashes
  *     (bit-for-bit the batch helpers: `Dedup.shinglesOf/minhashSigsOf/
  *     bandsOf`);
  *  2. band hashes equi-join the corpus band index — the only corpus-wide
  *     contact is on fixed-width hash keys, the d03 shape that survives
  *     100×;
  *  3. colliding (arrival, corpus) pairs verify against the corpus shingle
  *     index, work ∝ |candidates| (never corpus × batch);
  *  4. one verdict row per arriving doc: candidate count, verified
  *     near-dup count, first matching corpus doc, and the boolean gate.
  *
  * The multi-stage plan needs three aggregates, which a single streaming
  * query cannot chain — so the operator is a pure BATCH function
  * (`flagBatch`) driven from `foreachBatch` ([[CurrentState]]'s pattern):
  * each micro-batch is flagged independently against the static sides,
  * exactly the semantics of "gate each crawl increment against the corpus".
  * Corpus sides are computed once via `corpusIndex` and should be persisted
  * (or written to parquet) by the caller — at 100 TB they are the
  * band-index table every ingest job shares.
  */
object IngestNearDup {

  /** Static corpus sides: (band index, shingle index, per-doc counts).
    * Caller persists/checkpoints these — they are corpus-sized, built once. */
  def corpusIndex(corpusDocs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val sh = graft.analytics.Dedup.shinglesOf(corpusDocs)
    val bands = graft.analytics.Dedup.bandsOf(
      graft.analytics.Dedup.minhashSigsOf(sh))
      .withColumnRenamed("doc_id", "corpus_id")
    val shingles = sh.withColumnRenamed("doc_id", "corpus_id")
    val counts = shingles.groupBy(col("corpus_id")).agg(count(lit(1)).as("nc"))
    (bands, shingles, counts)
  }

  /** Band-collision candidates and exact-Jaccard-verified pairs of one
    * batch — the shared core of the per-doc verdicts (`flagBatch`) and
    * the raw edge stream (`verifiedPairs`). */
  private def candidatesAndVerified(arrivals: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, corpusCounts: DataFrame,
      minJaccard: Double): (DataFrame, DataFrame) = {
    val sh = graft.analytics.Dedup.shinglesOf(arrivals)
      .withColumnRenamed("doc_id", "new_id")
    val bands = graft.analytics.Dedup.bandsOf(
      graft.analytics.Dedup.minhashSigsOf(
        sh.withColumnRenamed("new_id", "doc_id")))
      .withColumnRenamed("doc_id", "new_id")
    val cands = bands.join(corpusBands, Seq("band", "band_hash"))
      .select(col("new_id"), col("corpus_id")).distinct()
    val na = sh.groupBy(col("new_id")).agg(count(lit(1)).as("na"))
    val shared = cands
      .join(sh, "new_id")
      .join(corpusShingles, Seq("corpus_id", "s"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
    val verified = shared
      .join(na, "new_id")
      .join(corpusCounts, "corpus_id")
      .filter(col("shared").cast("double") /
        (col("na") + col("nc") - col("shared")) >= minJaccard)
    (cands, verified)
  }

  /** The verified near-dup PAIRS of one batch as an `(i, j)` edge frame
    * (i = arriving doc, j = its corpus near-dup) — the exact input shape
    * `IncrementalComponents.merge`/`start` consume, closing the loop:
    * gate flags the pair, the component view absorbs it, and every
    * downstream curation action (canonical pick, soft-dedup weight,
    * leakage-safe split) sees the merged cluster without a batch
    * recompute. */
  def verifiedPairs(arrivals: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, corpusCounts: DataFrame,
      minJaccard: Double = 0.7): DataFrame =
    candidatesAndVerified(arrivals, corpusBands, corpusShingles, corpusCounts,
      minJaccard)._2.select(col("new_id").as("i"), col("corpus_id").as("j"))

  /** Flag one batch of arrivals (doc_id, text) against the corpus sides.
    * Every arrival gets a verdict row — a doc too short to shingle (or
    * with no band collision at all) reports zero candidates rather than
    * silently bypassing the gate. */
  def flagBatch(arrivals: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, corpusCounts: DataFrame,
      minJaccard: Double = 0.7): DataFrame = {
    val (cands, verified) = candidatesAndVerified(arrivals, corpusBands,
      corpusShingles, corpusCounts, minJaccard)
    arrivals.select(col("doc_id")).distinct()
      .join(cands.groupBy(col("new_id")).agg(count(lit(1)).as("n_candidates"))
        .withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .join(verified.groupBy(col("new_id")).agg(
        count(lit(1)).as("n_neardups"),
        min(col("corpus_id")).as("first_neardup"))
        .withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_neardups", coalesce(col("n_neardups"), lit(0L)))
      .withColumn("neardup", col("n_neardups") > 0L)
  }

  /** Run the gate over a stream of (doc_id, text): each micro-batch is
    * flagged against the static sides and handed to `sink`. */
  def start(stream: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, corpusCounts: DataFrame,
      checkpoint: String, minJaccard: Double = 0.7)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusBands, corpusShingles, corpusCounts, minJaccard), id)
      }
      .start()
}
