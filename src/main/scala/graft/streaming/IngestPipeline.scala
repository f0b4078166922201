package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed ingestion gate — [[IngestQuality]], [[IngestDedup]] (exact
  * tiles), [[IngestNearDup]] (MinHash+LSH) and optionally
  * [[IngestSemDedup]] (embedding space) run as ONE foreachBatch pass, the
  * way a real crawl pipeline runs them: every arriving document gets a
  * single verdict row, and each corpus-side index is read once per batch.
  *
  * Stage order is cheapest-first so work shrinks monotonically:
  *  1. quality — per-row narrow expressions (entropy, token stats), zero
  *     corpus contact, zero shuffles; rejects never reach a join;
  *  2. exact tile dedup — quality survivors explode to tile hashes and
  *     left-join the static corpus tile index;
  *  2.5. chunk (only when the corpus sides carry a chunk-hash index —
  *     `CorpusSides.withChunkGate`) — exact survivors probe the corpus
  *     chunk index with their t26 64-token windows: the repeated-passage
  *     screen (license blocks, syndicated paragraphs) document-level
  *     tiles and MinHash both miss, at tile-gate cost;
  *  3. near-dup — survivors band-join the static corpus band index,
  *     exact-Jaccard verify on collisions only;
  *  3.5. span (only when the corpus sides carry a positional-gram index —
  *     `CorpusSides.withSpanGate`) — near-dup survivors probe the corpus
  *     gram index and corpus-present grams union into maximal verbatim
  *     spans: the partial-plagiarism signal Jaccard misses;
  *  4. semantic (only when the corpus sides carry an embedding band index
  *     AND the batch has an `embedding` column) — near-dup survivors
  *     band-join the corpus EMBEDDING index, exact integer cosine verify
  *     on collisions only: the SemDeDup signal as the last, most
  *     expensive line of defense.
  *
  * The single pass is EQUAL to chaining the gates independently
  * (IngestPipelineSpec proves output parity): each stage's predicate
  * depends only on its own signals, so filtering early is pure work
  * elimination, not a semantic change. Per-batch corpus contact stays the
  * scale shape the singles have — fixed-width hash-key joins against
  * persisted indexes, work ∝ batch + candidates, never corpus × batch
  * (StreamShapeSpec locks this on the composed plan too).
  */
object IngestPipeline {

  /** The static corpus sides the gates share. Built once from the
    * corpus, persisted (or written as tables) by the caller — at 100 TB
    * these are the shared index tables every ingest job mounts. `sem` is
    * the optional [[IngestSemDedup.corpusIndex]] over the corpus
    * embeddings; absent, stage 4 is skipped. */
  final case class CorpusSides(tiles: DataFrame, bands: DataFrame,
      shingles: DataFrame, counts: DataFrame,
      sem: Option[DataFrame] = None,
      grams: Option[DataFrame] = None,
      chunks: Option[DataFrame] = None) {
    def persist(): CorpusSides = {
      (Seq(tiles, bands, shingles, counts) ++ sem ++ grams ++ chunks).foreach(
        _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      this
    }
    def unpersist(): Unit =
      (Seq(tiles, bands, shingles, counts) ++ sem ++ grams ++ chunks)
        .foreach(_.unpersist())

    /** Enable the verbatim-copy span stage: adds the corpus positional-gram
      * index ([[IngestSpanDedup.corpusIndex]]) to the shared sides. */
    def withSpanGate(corpusDocs: DataFrame): CorpusSides =
      copy(grams = Some(IngestSpanDedup.corpusIndex(corpusDocs)))

    /** Enable the chunk-window stage: adds the distinct corpus chunk-hash
      * index ([[IngestChunkDedup.corpusIndex]]) to the shared sides. */
    def withChunkGate(corpusDocs: DataFrame): CorpusSides =
      copy(chunks = Some(IngestChunkDedup.corpusIndex(corpusDocs)))
  }

  def corpusIndex(corpusDocs: DataFrame): CorpusSides = {
    val tiles = IngestDedup.corpusIndex(corpusDocs)
    val (bands, shingles, counts) = IngestNearDup.corpusIndex(corpusDocs)
    CorpusSides(tiles, bands, shingles, counts)
  }

  /** Corpus sides including the semantic stage: `corpusVectors` is
    * (vec_id, embedding) with vec_id = doc_id. */
  def corpusIndex(corpusDocs: DataFrame, corpusVectors: DataFrame): CorpusSides =
    corpusIndex(corpusDocs).copy(
      sem = Some(IngestSemDedup.corpusIndex(corpusVectors)))

  /** Gate one batch of arrivals (doc_id, text). One verdict row per
    * arriving doc: the quality signals, the dedup flags of whichever
    * stages the doc reached (null-safe defaults for stages it never
    * reached), and `verdict` ∈ rejected_quality | exact_dup | chunk_dup
    * (chunk side present) | near_dup | span_dup (gram side present) |
    * sem_dup (embedding side present) | accepted. */
  def gateBatch(batch: DataFrame, sides: CorpusSides,
      minEntropy: Double = 3.0, maxEntropy: Double = 6.0,
      minTokens: Long = 10L, minDistinctRatio: Double = 0.2,
      minFrac: Double = 0.5, minJaccard: Double = 0.7,
      minCos: Double = 0.9, maxSpanRatio: Double = 0.5,
      minChunkFrac: Double = 0.5): DataFrame =
    gateBatchTracked(batch, sides, minEntropy, maxEntropy, minTokens,
      minDistinctRatio, minFrac, minJaccard, minCos, maxSpanRatio,
      minChunkFrac)._1

  /** [[gateBatch]] plus the per-batch CACHED stage frames the caller must
    * unpersist once the verdict has been consumed ([[start]] does).
    *
    * Why the caching: the verdict plan references each stage's survivor
    * frame several times (exact feeds the flag join AND the near-dup
    * input; near feeds the flag join AND the semantic input; everything
    * re-derives the quality scan), and the stage internals fan out
    * further (the near-dup gate alone references the arrival shingle
    * explode three times) — uncached, the composed DAG re-derives the
    * whole upstream at every reference and one batch pays the pipeline
    * ~10×, not once (measured 9.3 s vs 1.0 s on a 750-doc batch).
    * Lazy persist keeps the lineage intact — the per-batch plan still
    * shows the corpus contact running through the persisted index
    * (StreamShapeSpec's lock) — while each stage computes once per
    * batch. The frames are batch-sized, never corpus-sized. */
  def gateBatchTracked(batch: DataFrame, sides: CorpusSides,
      minEntropy: Double = 3.0, maxEntropy: Double = 6.0,
      minTokens: Long = 10L, minDistinctRatio: Double = 0.2,
      minFrac: Double = 0.5, minJaccard: Double = 0.7,
      minCos: Double = 0.9, maxSpanRatio: Double = 0.5,
      minChunkFrac: Double = 0.5): (DataFrame, Seq[DataFrame]) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val temps = collection.mutable.ArrayBuffer.empty[DataFrame]
    def cached(df: DataFrame): DataFrame = { temps += df.persist(lvl); df }
    val scored = cached(IngestQuality.score(batch)
      .withColumn("quality_pass",
        col("entropy") >= minEntropy && col("entropy") <= maxEntropy &&
          col("n_tokens") >= minTokens &&
          col("distinct_ratio") >= minDistinctRatio))
    val qPass = cached(scored.filter(col("quality_pass")).select("doc_id", "text"))
    val exact = cached(IngestDedup.flagArrivals(qPass, sides.tiles, minFrac)
      .select(col("doc_id"), col("matched_frac"), col("dup").as("exact_dup")))
    val exactPass = cached(qPass.join(
      exact.filter(!col("exact_dup")).select("doc_id"), Seq("doc_id"), "left_semi"))
    // stage 2.5 (only when the corpus sides carry a chunk index): the
    // t26 repeated-passage screen over exact survivors — tile-gate cost,
    // so it runs BEFORE the banding/verify work of near-dup
    val chunkStage = sides.chunks
    val (chunkCols, nearInput) = chunkStage match {
      case None => (None, exactPass)
      case Some(idx) =>
        val ch = cached(IngestChunkDedup.flagArrivals(exactPass, idx, minChunkFrac)
          .select(col("doc_id"), col("n_chunks"), col("dup_chunks"),
            col("dup_frac").as("chunk_frac"), col("dup").as("chunkdup")))
        (Some(ch), cached(exactPass.join(
          ch.filter(!col("chunkdup")).select("doc_id"), Seq("doc_id"), "left_semi")))
    }
    val near = cached(IngestNearDup.flagBatch(nearInput,
        sides.bands, sides.shingles, sides.counts, minJaccard)
      .select(col("doc_id"), col("n_candidates"), col("n_neardups"),
        col("neardup"), col("first_neardup")))
    val flagged0 = scored
      .select("doc_id", "entropy", "n_tokens", "distinct_ratio", "quality_pass")
      .join(exact, Seq("doc_id"), "left")
    val flagged = chunkCols.fold(flagged0)(ch => flagged0.join(ch, Seq("doc_id"), "left"))
      .join(near, Seq("doc_id"), "left")
    // survivors of stage 3, input to the optional later stages (computed
    // lazily — only when a later stage actually runs)
    lazy val nearPass = cached(nearInput.join(
      near.filter(!col("neardup")).select("doc_id"), Seq("doc_id"), "left_semi"))
    // stage 3.5 (only when the corpus sides carry a gram index): verbatim-
    // copy span coverage of near-dup survivors — the partial-plagiarism
    // signal Jaccard misses (low set overlap, high contiguous-run overlap)
    val spanStage = sides.grams
    val (withSpan, spanPass) = spanStage match {
      case None => (flagged, () => nearPass)
      case Some(g) =>
        val span = cached(IngestSpanDedup.flagBatch(nearPass, g, maxSpanRatio)
          .select(col("doc_id"), col("span_tokens"), col("n_spans"),
            col("span_ratio"), col("spandup")))
        (flagged.join(span, Seq("doc_id"), "left"),
          () => cached(nearPass.join(
            span.filter(!col("spandup")).select("doc_id"), Seq("doc_id"), "left_semi")))
    }
    // stage 4 runs only with both an embedding index and embedding data;
    // survivors of the previous stages that carry a vector are checked,
    // everything else passes through with null semantic signals
    val semStage = sides.sem.filter(_ => batch.columns.contains("embedding"))
    val withSem = semStage match {
      case None => withSpan
      case Some(idx) =>
        val vecs = cached(batch
          .select(col("doc_id").as("vec_id"), col("embedding"))
          .where(col("embedding").isNotNull)
          .join(spanPass().select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"))
        val sem = IngestSemDedup.flagBatch(vecs, idx, minCos)
          .select(col("vec_id").as("doc_id"),
            col("n_candidates").as("n_semcands"),
            col("n_semdups"), col("semdup"), col("first_semdup"))
        withSpan.join(sem, Seq("doc_id"), "left")
    }
    val verdict = {
      val afterExact = when(!col("quality_pass"), "rejected_quality")
        .when(col("exact_dup"), "exact_dup")
      val base = (if (chunkStage.isDefined)
        afterExact.when(col("chunkdup"), "chunk_dup") else afterExact)
        .when(col("neardup"), "near_dup")
      val withSpanV =
        if (spanStage.isDefined) base.when(col("spandup"), "span_dup") else base
      (if (semStage.isDefined) withSpanV.when(col("semdup"), "sem_dup")
       else withSpanV)
        .otherwise("accepted")
    }
    (withSem
      .withColumn("verdict", verdict)
      .withColumn("accepted", col("verdict") === "accepted"),
      temps.toSeq)
  }

  /** Run the composed gate over a stream of (doc_id, text): each
    * micro-batch makes one pass through all three stages and hands the
    * verdict frame to `sink`; the per-batch stage caches are dropped once
    * the sink returns (a long-running stream must not accumulate one
    * cache entry per stage per batch). */
  def start(stream: DataFrame, sides: CorpusSides, checkpoint: String,
      minJaccard: Double = 0.7, minCos: Double = 0.9)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (verdicts, temps) = gateBatchTracked(batch, sides,
          minJaccard = minJaccard, minCos = minCos)
        try sink(verdicts, id)
        finally temps.foreach(_.unpersist())
      }
      .start()
}
