package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time quality gate — the streaming twin of the batch quality
  * stack (t15 entropy, t01/t04 token stats).
  *
  * A crawl pipeline scores and gates documents as they ARRIVE, not in a
  * nightly batch: pathological inputs (key-mash, encoded blobs, repeated
  * characters, near-empty pages) should never reach the corpus store.
  * Every signal here is a per-row narrow expression — the native
  * `char_entropy` kernel plus codegen'd token counts — so the gate is
  * completely STATELESS: no watermark, no state store, no shuffle; each
  * micro-batch filters at scan speed, and append mode emits each accepted
  * document exactly once. At 100 TB this is the shape that keeps
  * ingestion back-pressure-free — the gate adds zero exchanges to the
  * stream, and the same function applies unchanged to the batch backfill
  * (the parity spec pins stream ≡ batch bit-for-bit).
  */
object IngestQuality {

  /** Score (doc_id, text) rows: entropy, token count, lexical diversity.
    * Works identically on a streaming or batch frame. */
  def score(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9']+"), lit(0))
    docs
      .withColumn("entropy", graft.functions.CharEntropy.charEntropy(col("text")))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast("double") /
          greatest(size(toks).cast("double"), lit(1.0)))
  }

  /** The gate: keep documents inside the natural-text band. Thresholds are
    * policy (tuned on t15/t04's corpus profile); the dataflow is the
    * contract. */
  def gate(docs: DataFrame,
      minEntropy: Double = 3.0, maxEntropy: Double = 6.0,
      minTokens: Long = 10L, minDistinctRatio: Double = 0.2): DataFrame =
    score(docs).filter(
      col("entropy") >= minEntropy && col("entropy") <= maxEntropy &&
        col("n_tokens") >= minTokens &&
        col("distinct_ratio") >= minDistinctRatio)
}
