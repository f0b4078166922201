package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.Similarity

/** Ingestion-time SEMANTIC near-duplicate gate — the streaming twin of
  * batch s02 (banded random-hyperplane LSH over embeddings), completing
  * the ingest-gate family: [[IngestDedup]] (exact tiles), [[IngestNearDup]]
  * (MinHash+LSH text), and this operator (embedding space — the SemDeDup
  * signal at arrival time).
  *
  * A pipeline embedding every crawled document doesn't re-project the
  * whole corpus per crawl; it checks each ARRIVING vector's band keys
  * against the existing corpus band index, then verifies only colliding
  * pairs with the exact integer cosine — s02's verify-before-emit
  * contract, so a flag means "truly ≥ minCos against some existing
  * vector", never "happened to share a band".
  *
  * Dataflow per micro-batch (all against the STATIC corpus index):
  *  1. arrival embedding → quantize → 32 sign projections → 2×16-bit band
  *     keys (bit-for-bit `Similarity.bandedOf`, the s02 build pass);
  *  2. per-band equi-join against the corpus band index — corpus-wide
  *     contact happens only on fixed-width int keys;
  *  3. colliding (arrival, corpus) pairs fetch exactly the candidate
  *     corpus vectors and verify exact cosine — work ∝ |candidates|,
  *     never corpus × batch (random non-dup vectors collide on a 16-bit
  *     band with p ≈ 2⁻¹⁶, so the candidate set IS the near-dup sliver);
  *  4. one verdict row per arriving vector: candidate count, verified
  *     count, first matching corpus id, and the boolean gate.
  *
  * Like [[IngestNearDup]], the multi-aggregate plan cannot chain in a
  * single streaming query, so the operator is a pure batch function
  * (`flagBatch`) driven from `foreachBatch`; each micro-batch is flagged
  * independently against the static index — exactly the semantics of
  * "gate each crawl increment against the corpus". At 100 TB the corpus
  * index (id, q, n2, bands) is the persisted table every ingest job
  * shares; it is touched per batch only through band-key equi-joins and
  * candidate-sized fetches.
  */
object IngestSemDedup {

  /** Static corpus side: (corpus_id, qc, n2c, b0..bN) — built once from
    * (vec_id, embedding) rows, persisted by the caller. */
  def corpusIndex(corpusVectors: DataFrame): DataFrame = {
    val banded = Similarity.bandedOf(corpusVectors)
    val bandCols = (0 until Similarity.numBands).map(k => col(s"b$k"))
    banded.select(
      (Seq(col("vec_id").as("corpus_id"), col("q").as("qc"), col("n2").as("n2c"))
        ++ bandCols): _*)
  }

  /** Flag one batch of arrivals (vec_id, embedding) against the corpus
    * index. Every arrival gets a verdict row — zero candidates is an
    * explicit verdict, not a silent bypass. */
  def flagBatch(arrivals: DataFrame, corpusIdx: DataFrame,
      minCos: Double = 0.9): DataFrame = {
    val a = Similarity.bandedOf(arrivals)
    val newSide = a.select(
      (Seq(col("vec_id").as("new_id"), col("q").as("qa"), col("n2").as("n2a"))
        ++ (0 until Similarity.numBands).map(k => col(s"b$k"))): _*)
    val cands = (0 until Similarity.numBands).map { k =>
      newSide.select(col("new_id"), col(s"b$k").as("bh"))
        .join(corpusIdx.select(col("corpus_id"), col(s"b$k").as("bh")), "bh")
        .select(col("new_id"), col("corpus_id"))
    }.reduce(_ unionAll _).distinct()
    val verified = cands
      .join(newSide.select(col("new_id"), col("qa"), col("n2a")), "new_id")
      .join(corpusIdx.select(col("corpus_id"), col("qc"), col("n2c")), "corpus_id")
      .withColumn("cos", Similarity.exactCosine(col("qa"), col("qc"), col("n2a"), col("n2c")))
      .filter(col("cos") >= minCos)
    arrivals.select(col("vec_id")).distinct()
      .join(cands.groupBy(col("new_id")).agg(count(lit(1)).as("n_candidates"))
        .withColumnRenamed("new_id", "vec_id"), Seq("vec_id"), "left")
      .join(verified.groupBy(col("new_id")).agg(
        count(lit(1)).as("n_semdups"),
        min(col("corpus_id")).as("first_semdup"))
        .withColumnRenamed("new_id", "vec_id"), Seq("vec_id"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_semdups", coalesce(col("n_semdups"), lit(0L)))
      .withColumn("semdup", col("n_semdups") > 0L)
  }

  /** Run the gate over a stream of (vec_id, embedding): each micro-batch
    * is flagged against the static index and handed to `sink`. */
  def start(stream: DataFrame, corpusIdx: DataFrame, checkpoint: String,
      minCos: Double = 0.9)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusIdx, minCos), id)
      }
      .start()
}
