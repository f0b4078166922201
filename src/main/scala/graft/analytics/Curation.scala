package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the composition layer a training-data
  * pipeline actually runs over `documents`: quality gate → exact dedup →
  * per-stratum accounting, and deterministic hash sampling for training
  * mixes. Everything is a narrow scan + one aggregate shuffle; at 100 TB
  * the quality gate and hash bucketing run at scan speed inside
  * WholeStageCodegen and only the (tiny) per-stratum aggregates shuffle.
  * Sampling is md5-deterministic — re-running the pipeline reproduces the
  * exact same training mix, with no RNG state to checkpoint.
  */
object Curation {
  import Tables.t

  private val TOKS_SQL = """regexp_extract_all(lower(text), '[a-z0-9'']+')"""

  val defs: Seq[QueryDef] = Seq(
    // ---- p01: the end-to-end curation pass ----
    // quality gate (length + lexical-diversity) → exact dedup by content
    // hash (keep the smallest doc_id — d01's rule) → per-(source, lang)
    // accounting. The shape every corpus build runs nightly.
    QueryDef(
      "p01_corpus_curation",
      (s, dir) => {
        import s.implicits._
        val toksed = t(s, dir, "documents")
          .withColumn("tk", regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0)))
          .withColumn("n", size($"tk").cast("long"))
          .withColumn("h", md5($"text"))
          .filter($"n" >= 25L &&
            size(array_distinct($"tk")).cast("double") >= $"n" * 0.4)
          .select($"doc_id", $"source", $"lang", $"h", $"n")
        val keep = toksed.groupBy($"h").agg(min($"doc_id").as("doc_id"))
        toksed.join(keep, Seq("h", "doc_id"), "left_semi")
          .groupBy($"source", $"lang")
          .agg(
            count(lit(1)).as("kept"),
            sum($"n").as("total_tokens"),
            (sum($"n").cast("double") / count(lit(1))).as("avg_tokens"))
          .orderBy($"source", $"lang")
      },
      Some(s"""
        WITH tk AS (
          SELECT doc_id, lang, source, md5(text) AS h, $TOKS_SQL AS tk
          FROM documents),
        q AS (
          SELECT doc_id, lang, source, h, CAST(len(tk) AS BIGINT) AS n
          FROM tk
          WHERE len(tk) >= 25
            AND CAST(len(list_distinct(tk)) AS DOUBLE) >= len(tk) * 0.4),
        keep AS (SELECT h, min(doc_id) AS doc_id FROM q GROUP BY h)
        SELECT q.source, q.lang, COUNT(*) AS kept,
               CAST(SUM(q.n) AS BIGINT) AS total_tokens,
               CAST(CAST(SUM(q.n) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_tokens
        FROM q JOIN keep ON keep.h = q.h AND keep.doc_id = q.doc_id
        GROUP BY q.source, q.lang
        ORDER BY q.source, q.lang"""),
    ),

    // ---- p02: deterministic stratified sampling ----
    // Per-language sampling rates (downsample the dominant language, keep
    // the tail) decided by a content-free hash of the stable key, so the
    // mix is reproducible run-over-run and across engines.
    QueryDef(
      "p02_stratified_sample",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("bucket",
            conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10).cast("long") % 100L)
          .withColumn("rate", when($"lang" === "en", 10L).otherwise(50L))
          .groupBy($"lang")
          .agg(
            max($"rate").as("rate"),
            sum(when($"bucket" < $"rate", 1L).otherwise(0L)).as("sampled"),
            count(lit(1)).as("total"))
          .withColumn("frac", $"sampled".cast("double") / $"total")
          .select($"lang", $"rate", $"sampled", $"total", $"frac")
          .orderBy($"lang")
      },
      Some("""
        WITH b AS (
          SELECT lang,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket,
                 CASE WHEN lang = 'en' THEN 10 ELSE 50 END AS rate
          FROM documents)
        SELECT lang,
               CAST(MAX(rate) AS BIGINT) AS rate,
               CAST(COUNT(*) FILTER (WHERE bucket < rate) AS BIGINT) AS sampled,
               COUNT(*) AS total,
               CAST(COUNT(*) FILTER (WHERE bucket < rate) AS DOUBLE)/COUNT(*) AS frac
        FROM b GROUP BY lang ORDER BY lang"""),
    ),
  )
}
