package graft.analytics

import graft.GraftSession.MaterializeOps
import graft.{QueryDef, Tables}
import graft.sqlx._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for large-scale training-data pipelines, over the
  * `documents` table: tokenization, quality scoring, language-ID heuristic,
  * fingerprinting. All are per-row narrow transforms (no shuffle except the
  * final aggregate/sort) built from codegen'd `functions._` expressions —
  * at 100 TB these run at scan speed inside WholeStageCodegen.
  */
object TextOps {
  import Tables.t

  /** Word tokens of lower-cased text — same regex in the DuckDB oracle.
    * `private[analytics]`: p20's curriculum quality proxy reuses the ONE
    * tokenizer + stopword definition rather than growing a twin. */
  private[analytics] def toks(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9']+"), lit(0))
  private[analytics] val TOKS_SQL = """regexp_extract_all(lower(text), '[a-z0-9'']+')"""

  private[analytics] val stop = Seq("the", "a", "of", "and", "to", "in", "is")
  private[analytics] val STOP_SQL = stop.map(w => s"'$w'").mkString("(", ",", ")")

  /** THE t26 chunk definition — 64-token windows at stride 48 over the
    * shared tokenizer, one `struct(h: md5 content hash, nt: token count)`
    * per window, as a per-doc ARRAY (empty when the doc tokenizes to
    * nothing). Shared by the batch operator (t26, which posexplodes it)
    * and the ingestion-time chunk gate (`streaming/IngestChunkDedup`), so
    * batch and stream agree bit-for-bit — the tileArray pattern. A narrow
    * per-row transform (sequence + slice + md5 inside codegen, ~n/48
    * chunks per doc): works on a streaming DataFrame unchanged. */
  def chunkStructs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("chunks", when(col("n") > 0L, expr(
        """transform(
             sequence(CAST(0 AS BIGINT),
                      greatest(CAST(ceil((n - 64) / 48.0) AS BIGINT),
                               CAST(0 AS BIGINT))),
             ci -> named_struct(
               'h', md5(array_join(slice(tk, CAST(ci*48 + 1 AS INT),
                                         CAST(least(64, n - ci*48) AS INT)), ' ')),
               'nt', CAST(least(64, n - ci*48) AS BIGINT)))"""))
        .otherwise(expr("CAST(array() AS array<struct<h: string, nt: bigint>>)")))
      .select(col("doc_id"), col("chunks"))

  /** t10's sensitive-term lexicon (stand-in for a PII regex bank — the
    * synthetic corpus has no emails/phones/IPs to match). */
  private val BLOCKLIST = Seq("customer", "spark", "stream")
  private val BLOCKLIST_SQL = BLOCKLIST.map(w => s"'$w'").mkString("[", ",", "]")

  val defs: Seq[QueryDef] = Seq(
    // ---- t01: token statistics ----
    QueryDef(
      "t01_token_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("toks", toks($"text"))
          .select(
            $"doc_id",
            size($"toks").as("n_tokens"),
            length($"text").as("n_chars_text"),
            $"n_chars",
            size(array_distinct($"toks")).as("n_unique_tokens"),
            (aggregate($"toks", lit(0L), (acc, x) => acc + length(x)).cast("double")
              / size($"toks")).as("avg_token_len"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(len($TOKS_SQL) AS INT) AS n_tokens,
               CAST(length(text) AS INT) AS n_chars_text,
               n_chars,
               CAST(len(list_distinct($TOKS_SQL)) AS INT) AS n_unique_tokens,
               CAST(list_sum(list_transform($TOKS_SQL, x -> length(x))) AS DOUBLE)
                 / len($TOKS_SQL) AS avg_token_len
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- t02: stopword ratio ----
    QueryDef(
      "t02_stopword_ratio",
      (s, dir) => {
        import s.implicits._
        val stopArr = array(stop.map(lit): _*)
        t(s, dir, "documents")
          .withColumn("toks", toks($"text"))
          .withColumn("n_stop", size(filter($"toks", x => array_contains(stopArr, x))))
          .select($"doc_id", size($"toks").as("n_tokens"), $"n_stop",
            ($"n_stop".cast("double") / size($"toks")).as("stop_ratio"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(len($TOKS_SQL) AS INT) AS n_tokens,
               CAST(len(list_filter($TOKS_SQL, x -> x IN $STOP_SQL)) AS INT) AS n_stop,
               CAST(len(list_filter($TOKS_SQL, x -> x IN $STOP_SQL)) AS DOUBLE)
                 / len($TOKS_SQL) AS stop_ratio
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- t03: language-ID heuristic (marker-word n-gram scoring) ----
    QueryDef(
      "t03_lang_id",
      (s, dir) => {
        import s.implicits._
        val lc = concat(lit(" "), lower($"text"), lit(" "))
        def hits(words: Seq[String]): Column =
          words.map(w => when(lc.contains(s" $w "), 1).otherwise(0)).reduce(_ + _)
        t(s, dir, "documents")
          .withColumn("en_score", hits(Seq("the", "a", "of", "and")))
          .withColumn("fr_score", hits(Seq("le", "la", "et", "de")))
          .withColumn("es_score", hits(Seq("el", "los", "y", "que")))
          .withColumn("pred_lang",
            when($"en_score" >= $"fr_score" && $"en_score" >= $"es_score" && $"en_score" > 0, "en")
              .when($"fr_score" >= $"es_score" && $"fr_score" > 0, "fr")
              .when($"es_score" > 0, "es")
              .otherwise("und"))
          .select($"doc_id", $"lang", $"en_score", $"fr_score", $"es_score", $"pred_lang")
          .orderBy($"doc_id")
      },
      {
        def hitsSql(words: Seq[String]) = words
          .map(w => s"(CASE WHEN contains(' '||lower(text)||' ', ' $w ') THEN 1 ELSE 0 END)")
          .mkString("(", " + ", ")")
        val en = hitsSql(Seq("the", "a", "of", "and"))
        val fr = hitsSql(Seq("le", "la", "et", "de"))
        val es = hitsSql(Seq("el", "los", "y", "que"))
        Some(s"""
        SELECT doc_id, lang, en_score, fr_score, es_score,
               CASE WHEN en_score >= fr_score AND en_score >= es_score AND en_score > 0 THEN 'en'
                    WHEN fr_score >= es_score AND fr_score > 0 THEN 'fr'
                    WHEN es_score > 0 THEN 'es'
                    ELSE 'und' END AS pred_lang
        FROM (SELECT doc_id, lang, $en AS en_score, $fr AS fr_score, $es AS es_score
              FROM documents) x
        ORDER BY doc_id""")
      },
    ),

    // ---- t04: composite quality score ----
    QueryDef(
      "t04_quality_score",
      (s, dir) => {
        import s.implicits._
        val stopArr = array(stop.map(lit): _*)
        t(s, dir, "documents")
          .withColumn("toks", toks($"text"))
          .withColumn("n_tokens", size($"toks"))
          .withColumn("stop_ratio",
            size(filter($"toks", x => array_contains(stopArr, x))).cast("double") / $"n_tokens")
          .withColumn("len_score",
            when($"n_tokens" >= 100, 1.0).otherwise($"n_tokens".cast("double") / 100.0))
          .withColumn("score", lit(0.5) * $"len_score" + lit(0.5) * $"stop_ratio")
          .withColumn("tier",
            when($"score" >= 0.5, "high").when($"score" >= 0.3, "medium").otherwise("low"))
          .select($"doc_id", $"n_tokens", $"stop_ratio", $"score", $"tier")
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id, n_tokens, stop_ratio,
               0.5*len_score + 0.5*stop_ratio AS score,
               CASE WHEN 0.5*len_score + 0.5*stop_ratio >= 0.5 THEN 'high'
                    WHEN 0.5*len_score + 0.5*stop_ratio >= 0.3 THEN 'medium'
                    ELSE 'low' END AS tier
        FROM (
          SELECT doc_id,
                 CAST(len($TOKS_SQL) AS INT) AS n_tokens,
                 CAST(len(list_filter($TOKS_SQL, x -> x IN $STOP_SQL)) AS DOUBLE)
                   / len($TOKS_SQL) AS stop_ratio,
                 CASE WHEN len($TOKS_SQL) >= 100 THEN 1.0
                      ELSE CAST(len($TOKS_SQL) AS DOUBLE)/100.0 END AS len_score
          FROM documents) x
        ORDER BY doc_id"""),
    ),

    // ---- t05: document fingerprint (normalized-content hash) ----
    QueryDef(
      "t05_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp"),
            substring(md5(trim(regexp_replace(lower($"text"), "\\s+", " "))), 1, 8).as("fp_short"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 8) AS fp_short
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- t06: top word bigrams (n-gram frequency) ----
    QueryDef(
      "t06_top_bigrams",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("toks", toks($"text"))
          // Scala UDF over the interpreted SQL higher-order transform:
          // ~5x faster (see graft.functions.Shingles).
          .withColumn("grams", graft.functions.Shingles.ngrams(2)($"toks"))
          .select(explode($"grams").as("gram"))
          .groupBy($"gram").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"gram")
          .limit(20)
      },
      Some(s"""
        SELECT gram, COUNT(*) AS n FROM (
          SELECT unnest(list_transform(range(1, len($TOKS_SQL)),
                        i -> $TOKS_SQL[i] || ' ' || $TOKS_SQL[i+1])) AS gram
          FROM documents) x
        GROUP BY gram ORDER BY n DESC, gram LIMIT 20"""),
    ),

    // ---- t08: rolling-hash winnowing fingerprints (MOSS-style) ----
    // Polynomial rolling hash over 8-char grams of the normalized text,
    // winnowed to the min hash of each 4-gram window — the classic
    // document-fingerprinting scheme. All arithmetic is exact BIGINT
    // (max sum 127·Σ31^j ≈ 3.6e12 < 2^53), so the DuckDB oracle replays it
    // bit-for-bit. Per-row narrow transform + explode: runs at scan speed,
    // shuffle only in the final sort.
    QueryDef(
      "t08_winnow_fingerprint",
      (s, dir) => {
        import s.implicits._
        val norm = trim(regexp_replace(lower($"text"), "\\s+", " "))
        t(s, dir, "documents")
          .withColumn("fps",
            graft.functions.RollingHash.winnow(8, 4, 1L << 25)(norm))
          .select($"doc_id", explode($"fps").as("fp"))
          .orderBy($"doc_id", $"fp")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
          FROM documents),
        g AS (
          SELECT doc_id, list_transform(range(length(norm)-7), i ->
                   (CAST(ascii(substr(norm, CAST(i+1 AS INT), 1)) AS BIGINT)*27512614111
                  + CAST(ascii(substr(norm, CAST(i+2 AS INT), 1)) AS BIGINT)*887503681
                  + CAST(ascii(substr(norm, CAST(i+3 AS INT), 1)) AS BIGINT)*28629151
                  + CAST(ascii(substr(norm, CAST(i+4 AS INT), 1)) AS BIGINT)*923521
                  + CAST(ascii(substr(norm, CAST(i+5 AS INT), 1)) AS BIGINT)*29791
                  + CAST(ascii(substr(norm, CAST(i+6 AS INT), 1)) AS BIGINT)*961
                  + CAST(ascii(substr(norm, CAST(i+7 AS INT), 1)) AS BIGINT)*31
                  + CAST(ascii(substr(norm, CAST(i+8 AS INT), 1)) AS BIGINT)) % 33554432) AS grams
          FROM d WHERE length(norm) >= 8),
        w AS (
          SELECT doc_id, list_distinct(list_transform(range(len(grams)-3), p ->
                   list_min(grams[CAST(p+1 AS INT):CAST(p+4 AS INT)]))) AS fps
          FROM g WHERE len(grams) >= 4)
        SELECT doc_id, unnest(fps) AS fp FROM w ORDER BY doc_id, fp"""),
    ),

    // ---- t07: BPE-ish token counting (runs of letters | digits | other) ----
    QueryDef(
      "t07_bpeish_token_count",
      (s, dir) => {
        import s.implicits._
        val pieces = regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
        t(s, dir, "documents")
          .select($"doc_id", size(pieces).as("n_pieces"), $"n_chars")
          .withColumn("chars_per_piece", $"n_chars".cast("double") / $"n_pieces")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_pieces,
               n_chars,
               CAST(n_chars AS DOUBLE)
                 / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS chars_per_piece
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- t09: repetition signals (Gopher-style quality filters: ----
    // ---- top-bigram share, duplicate bi/tri-gram occurrence counts) ----
    // All outputs are exact integer counts (numerators/denominators), so
    // the hash compare needs no float discipline; downstream ratios are
    // the consumer's division. One tagged union keeps both n-gram lengths
    // in ONE (doc_id, n, gram) shuffle; the per-doc regroup moves only the
    // small aggregate. N-gram lists come from the native codegen
    // expression, not interpreted HOF lambdas.
    QueryDef(
      "t09_repetition",
      (s, dir) => {
        import s.implicits._
        // both n-gram lengths from ONE tokenize pass: posexplode over the
        // two ngram arrays replaces the two-branch union (which re-ran
        // tokenize + ngrams once per branch); n = pos + 2 reproduces the
        // tag, and the consumer is a groupBy, so row order is moot
        val grams = t(s, dir, "documents")
          .withColumn("tk", toks($"text"))
          .select($"doc_id", posexplode(array(
            graft.functions.Shingles.ngrams(2)($"tk"),
            graft.functions.Shingles.ngrams(3)($"tk"))).as(Seq("i", "gs")))
          .select($"doc_id", ($"i" + 2).as("n"), explode($"gs").as("g"))
        grams.groupBy($"doc_id", $"n", $"g").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(
            max(when($"n" === 2, $"c")).as("top2_cnt"),
            sum(when($"n" === 2, $"c" - 1)).as("dup2_cnt"),
            sum(when($"n" === 2, $"c")).as("n2"),
            sum(when($"n" === 3, $"c" - 1)).as("dup3_cnt"),
            sum(when($"n" === 3, $"c")).as("n3"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tks AS (SELECT doc_id, $TOKS_SQL AS tk FROM documents),
        grams AS (
          SELECT doc_id, 2 AS n,
                 unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i+1])) AS g
          FROM tks
          UNION ALL
          SELECT doc_id, 3 AS n,
                 unnest(list_transform(range(1, len(tk)-1),
                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
          FROM tks),
        cnt AS (SELECT doc_id, n, g, COUNT(*) AS c FROM grams GROUP BY doc_id, n, g)
        SELECT doc_id,
               MAX(CASE WHEN n=2 THEN c END) AS top2_cnt,
               CAST(SUM(CASE WHEN n=2 THEN c-1 END) AS BIGINT) AS dup2_cnt,
               CAST(SUM(CASE WHEN n=2 THEN c END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN n=3 THEN c-1 END) AS BIGINT) AS dup3_cnt,
               CAST(SUM(CASE WHEN n=3 THEN c END) AS BIGINT) AS n3
        FROM cnt GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- t10: blocklist redaction accounting (the PII/sensitive-term ----
    // ---- scrub pass every corpus release runs) ----
    // The synthetic corpus carries no real PII patterns, so the lexicon IS
    // the operator: a broadcast blocklist matched against the token
    // stream, reporting per-document hit and redacted-character counts
    // (what a release audit consumes). A production scrub swaps the inline
    // lexicon for a broadcast dictionary + regex bank (emails/phones/IPs)
    // — same narrow per-row shape, runs at scan speed inside codegen, no
    // shuffle except the final sort. All outputs are exact integers.
    QueryDef(
      "t10_blocklist_redaction",
      (s, dir) => {
        import s.implicits._
        val blockArr = array(BLOCKLIST.map(lit): _*)
        val hits = filter(toks($"text"), x => array_contains(blockArr, x))
        t(s, dir, "documents")
          .withColumn("h", hits)
          .select($"doc_id",
            size($"h").cast("long").as("n_hits"),
            coalesce(aggregate($"h", lit(0L), (acc, x) => acc + length(x)), lit(0L))
              .as("redacted_chars"),
            ($"n_chars" -
              coalesce(aggregate($"h", lit(0L), (acc, x) => acc + length(x)), lit(0L)))
              .as("clean_chars"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH h AS (
          SELECT doc_id, n_chars,
                 list_filter($TOKS_SQL, x -> list_contains($BLOCKLIST_SQL, x)) AS h
          FROM documents)
        SELECT doc_id,
               CAST(len(h) AS BIGINT) AS n_hits,
               CAST(COALESCE(list_sum(list_transform(h, x -> length(x))), 0) AS BIGINT) AS redacted_chars,
               n_chars - CAST(COALESCE(list_sum(list_transform(h, x -> length(x))), 0) AS BIGINT) AS clean_chars
        FROM h ORDER BY doc_id"""),
    ),

    // ---- t11: salient terms per source (tf/df keyword extraction) ----
    // The tokenizer-adjacent "what characterizes this source" pass: rank a
    // source's terms by term-frequency over corpus document-frequency.
    // The score is ONE division of two exact integers (identical IEEE754
    // in both engines) — a log-idf would differ in the last ulp between
    // libm implementations, so the rational form is the hash-stable
    // choice. Two aggregate shuffles over the token stream + a broadcast
    // of the (vocab-sized) df table; the corpus never self-joins, same
    // plan at 100 TB.
    QueryDef(
      "t11_salient_terms",
      (s, dir) => {
        import s.implicits._
        val tok = t(s, dir, "documents")
          .select($"doc_id", $"source", explode(toks($"text")).as("tok"))
          .filter(!$"tok".isin(stop: _*))
        val dfreq = tok.groupBy($"tok")
          .agg(countDistinct($"doc_id").as("df"))
        val tf = tok.groupBy($"source", $"tok").agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy($"source").orderBy($"score".desc, $"tok")
        tf.join(broadcast(dfreq), "tok")
          .withColumn("score", $"tf".cast("double") / $"df")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5)
          .select($"source", $"rn", $"tok", $"tf", $"df", $"score")
          .orderBy($"source", $"rn")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, source, unnest($TOKS_SQL) AS tok FROM documents),
        flt AS (SELECT * FROM tok WHERE tok NOT IN $STOP_SQL),
        dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM flt GROUP BY tok),
        tf AS (SELECT source, tok, COUNT(*) AS tf FROM flt GROUP BY source, tok),
        scored AS (
          SELECT tf.source, tf.tok, tf.tf, dfreq.df,
                 CAST(tf.tf AS DOUBLE) / dfreq.df AS score,
                 ROW_NUMBER() OVER (PARTITION BY tf.source
                                    ORDER BY CAST(tf.tf AS DOUBLE) / dfreq.df DESC, tf.tok) AS rn
          FROM tf JOIN dfreq ON dfreq.tok = tf.tok)
        SELECT source, rn, tok, tf, df, score FROM scored
        WHERE rn <= 5 ORDER BY source, rn"""),
    ),

    // ---- t12: hashed linear quality classifier (fastText-shaped ----
    // ---- inference: hashing trick + broadcast weight table)      ----
    // The quality-filter stage of a pretraining pipeline is usually a
    // linear text classifier (fastText wiki-vs-crawl, DCLM-style): hash
    // each token into D buckets, sum the bucket weights, threshold. This
    // operator is that INFERENCE dataflow: the model is a (bucket,
    // weight) table — broadcast, because a model is always tiny next to
    // the corpus — tokens map to buckets with the hashing trick
    // (md5 % D), and scoring is one broadcast-hash-join + per-doc sum,
    // i.e. scan speed at 100 TB with no shuffle except the per-doc
    // aggregate (which the doc_id partitioning makes local). Weights
    // here are a deterministic hash-derived stand-in (no training in
    // this container — the values are policy, the dataflow is the
    // operator); swapping in learned weights changes one small table.
    QueryDef(
      "t12_quality_classifier",
      (s, dir) => {
        import s.implicits._
        val D = 4096
        val weights = s.range(D).select($"id".cast("int").as("bucket"),
          (($"id" * 2654435761L) % 2001L - 1000L).as("w"))
        t(s, dir, "documents").repartition($"doc_id")
          .select($"doc_id", explode(toks($"text")).as("tok"))
          .withColumn("bucket",
            (conv(substring(md5($"tok"), 1, 6), 16, 10).cast("long") % D).cast("int"))
          .join(broadcast(weights), "bucket")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum($"w").as("raw"))
          .withColumn("score", $"raw".cast("double") / ($"n_tokens" * 1000L).cast("double"))
          .withColumn("label", when($"score" > 0, lit("keep")).otherwise(lit("drop")))
          .select($"doc_id", $"n_tokens", $"raw", $"score", $"label")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH weights AS (
          SELECT CAST(b AS INT) AS bucket, (b*2654435761) % 2001 - 1000 AS w
          FROM (SELECT unnest(range(4096)) AS b)),
        toks AS (SELECT doc_id, unnest($TOKS_SQL) AS tok FROM documents),
        bt AS (SELECT doc_id,
                      CAST(CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 4096 AS INT) AS bucket
               FROM toks),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS raw
          FROM bt JOIN weights USING (bucket) GROUP BY doc_id)
        SELECT doc_id, n_tokens, raw,
               CAST(raw AS DOUBLE)/CAST(n_tokens*1000 AS DOUBLE) AS score,
               CASE WHEN CAST(raw AS DOUBLE)/CAST(n_tokens*1000 AS DOUBLE) > 0
                    THEN 'keep' ELSE 'drop' END AS label
        FROM scored ORDER BY doc_id"""),
    ),

    // ---- t13: sequence-length histogram (context-window planning) ----
    // The question every packing/truncation policy starts from: how are
    // document token counts distributed, in power-of-two buckets, and
    // what share of the corpus clears each context size? The log2 bucket
    // is length(bin(n)) — an exact INTEGER via the binary-string width,
    // deliberately not floor(log2(n)) whose libm rounding may differ
    // between engines by an ulp at power boundaries. One narrow tokenize
    // pass + a ≤64-row aggregate + a window prefix-sum over those rows:
    // scan-speed at any corpus size.
    QueryDef(
      "t13_length_histogram",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val all = Window.partitionBy()
        val cum = Window.partitionBy().orderBy($"blen")
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, dir, "documents")
          .withColumn("n",
            size(regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).cast("long"))
          .filter($"n" > 0)
          .withColumn("blen", length(bin($"n")).cast("int"))
          .groupBy($"blen")
          .agg(count(lit(1)).as("n_docs"), sum($"n").as("tokens"))
          .withColumn("bucket_lo", expr("shiftleft(1L, blen - 1)"))
          .withColumn("bucket_hi", expr("shiftleft(1L, blen) - 1L"))
          .withColumn("cum_docs", sum($"n_docs").over(cum))
          .withColumn("doc_share",
            $"cum_docs".cast("double") / sum($"n_docs").over(all))
          .select($"blen", $"bucket_lo", $"bucket_hi", $"n_docs", $"tokens",
            $"cum_docs", $"doc_share")
          .orderBy($"blen")
      },
      Some(s"""
        WITH n AS (
          SELECT CAST(len($TOKS_SQL) AS BIGINT) AS n FROM documents
          WHERE len($TOKS_SQL) > 0),
        h AS (
          SELECT CAST(length(bin(n)) AS INT) AS blen,
                 COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tokens
          FROM n GROUP BY 1)
        SELECT blen,
               CAST(1 << (blen - 1) AS BIGINT) AS bucket_lo,
               CAST((1 << blen) - 1 AS BIGINT) AS bucket_hi,
               n_docs, tokens,
               CAST(SUM(n_docs) OVER (ORDER BY blen
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
               CAST(SUM(n_docs) OVER (ORDER BY blen
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / SUM(n_docs) OVER () AS doc_share
        FROM h ORDER BY blen"""),
    ),

    // ---- t14: lang-ID confusion matrix (the classifier's eval gate) ----
    // t03 predicts; this measures — predicted vs labeled language as a
    // confusion matrix with per-cell share of the true-label row. The
    // same accept/reject-gate pattern as s06/s08/d12: every heuristic
    // that routes corpus content needs its error structure measured, not
    // assumed (here: which languages leak into 'en', what 'und' hides).
    // One scan + a (labels × preds)-sized aggregate — nothing at corpus
    // scale but the classify pass itself.
    QueryDef(
      "t14_langid_confusion",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val lc = concat(lit(" "), lower($"text"), lit(" "))
        def hits(words: Seq[String]): Column =
          words.map(w => when(lc.contains(s" $w "), 1).otherwise(0)).reduce(_ + _)
        val preds = t(s, dir, "documents")
          .withColumn("en_score", hits(Seq("the", "a", "of", "and")))
          .withColumn("fr_score", hits(Seq("le", "la", "et", "de")))
          .withColumn("es_score", hits(Seq("el", "los", "y", "que")))
          .withColumn("pred_lang",
            when($"en_score" >= $"fr_score" && $"en_score" >= $"es_score" && $"en_score" > 0, "en")
              .when($"fr_score" >= $"es_score" && $"fr_score" > 0, "fr")
              .when($"es_score" > 0, "es")
              .otherwise("und"))
        preds.groupBy($"lang", $"pred_lang")
          .agg(count(lit(1)).as("n"))
          .withColumn("row_share",
            $"n".cast("double") / sum($"n").over(Window.partitionBy($"lang")))
          .orderBy($"lang", $"pred_lang")
      },
      {
        def hitsSql(words: Seq[String]) = words
          .map(w => s"(CASE WHEN contains(' '||lower(text)||' ', ' $w ') THEN 1 ELSE 0 END)")
          .mkString("(", " + ", ")")
        val en = hitsSql(Seq("the", "a", "of", "and"))
        val fr = hitsSql(Seq("le", "la", "et", "de"))
        val es = hitsSql(Seq("el", "los", "y", "que"))
        Some(s"""
        WITH preds AS (
          SELECT lang,
                 CASE WHEN en_score >= fr_score AND en_score >= es_score AND en_score > 0 THEN 'en'
                      WHEN fr_score >= es_score AND fr_score > 0 THEN 'fr'
                      WHEN es_score > 0 THEN 'es'
                      ELSE 'und' END AS pred_lang
          FROM (SELECT lang, $en AS en_score, $fr AS fr_score, $es AS es_score
                FROM documents) x)
        SELECT lang, pred_lang, COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY lang) AS row_share
        FROM preds GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")
      },
    ),

    // ---- t15: character-entropy quality filter ----
    // Shannon entropy of each document's code-point distribution via the
    // native codegen'd `char_entropy` expression (functions/CharEntropy) —
    // the cheap anomaly gate that catches repeated-char / key-mash /
    // encoded-blob documents before any tokenization. Per-row narrow
    // transform: the whole query is one scan + the final sort; no per-char
    // explode ever leaves the expression kernel. Entropy is quantized
    // (round(H·10⁴) — both engines sum doubles, whose order-dependent
    // round-off is ~1e-13 relative, far below the 1e-4 grid; log2 is the
    // same IEEE op up to 1 ulp in both engines).
    QueryDef(
      "t15_char_entropy",
      (s, dir) => {
        import s.implicits._
        graft.functions.CharEntropy.register(s)
        t(s, dir, "documents")
          .select(
            $"doc_id",
            length($"text").cast("long").as("n_cp"),
            round(graft.functions.CharEntropy.charEntropy($"text") * 10000)
              .cast("long").as("entropy_q"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        hist AS (
          SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM ch GROUP BY doc_id, c),
        ent AS (
          SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_cp,
                 log2(SUM(cnt)) - SUM(cnt * log2(cnt)) / SUM(cnt) AS h
          FROM hist GROUP BY doc_id)
        SELECT doc_id, n_cp,
               CAST(round(h * 10000) AS BIGINT) AS entropy_q
        FROM ent ORDER BY doc_id"""),
    ),

    // ---- t16: unigram-LM document scoring (the CCNet quality proxy) ----
    // Train a unigram language model on the corpus itself (token counts /
    // total), then score every document by its mean -log2 p(token) — "bits
    // per token". High-perplexity outliers (gibberish, OCR noise) and
    // ultra-low ones (boilerplate, repeated headers) both sit far from the
    // corpus band; CCNet buckets on exactly this signal. Dataflow: one
    // narrow explode, one hash agg for the vocab (linear, map-side
    // combined), one shuffle join tokens→counts, one per-doc agg. At 100 TB
    // the token→vocab join is the cost center: AQE skew-join splits the
    // stopword keys, or swap in a broadcast top-K vocab with an OOV bucket
    // — same dataflow, smaller exchange. Quantized ×10⁴ (see t15's note).
    QueryDef(
      "t16_unigram_logprob",
      (s, dir) => {
        import s.implicits._

        // persisted: the token stream feeds the vocab build AND the
        // scoring join (same two-consumer argument as t19's bigram
        // stream; plain string columns, cache-friendly)
        val tok = t(s, dir, "documents")
          .select($"doc_id", explode(toks($"text")).as("w"))
          .persistOnce()
        val vocab = tok.groupBy($"w").agg(count(lit(1)).cast("double").as("cnt"))
        // Σ vocab counts ≡ total token instances — computed as a narrow
        // sum(size(tokens)) over the doc scan instead of re-exploding the
        // corpus a third time (Spark does not reuse the explode subtree).
        val total = t(s, dir, "documents")
          .agg(sum(size(toks($"text"))).cast("double").as("total"))
        tok.join(vocab, "w")
          .crossJoin(broadcast(total))
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_tok"),
            round(avg(log2($"total") - log2($"cnt")) * 10000)
              .cast("long").as("bpt_q"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest($TOKS_SQL) AS w FROM documents),
        vocab AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cnt FROM tok GROUP BY w),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab)
        SELECT doc_id, COUNT(*) AS n_tok,
               CAST(round(AVG(log2(total) - log2(cnt)) * 10000) AS BIGINT) AS bpt_q
        FROM tok JOIN vocab USING (w) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- t17: Zipf slope — corpus-health diagnostic ----
    // OLS fit of log2(count) against log2(rank) over the top-1000 tokens.
    // Natural language sits near slope −1 (Zipf's law); template-generated
    // or heavily-duplicated corpora flatten or step. One number that
    // monitors corpus composition drift release-over-release. Scale shape:
    // the vocab agg is linear; the top-1000 comes from TakeOrderedAndProject
    // (distributed top-k, NO global vocab sort); ranking then happens on a
    // 1000-row frame. The four regression sums route through DECIMAL
    // accumulators (sqlx) so the reduction is order-independent, and the
    // closed-form slope/intercept are single double ops on both engines.
    QueryDef(
      "t17_zipf_slope",
      (s, dir) => {
        import s.implicits._
        val topv = t(s, dir, "documents")
          .select(explode(toks($"text")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"w").limit(1000)
        val xy = topv
          .withColumn("r", row_number().over(
            Window.orderBy($"cnt".desc, $"w")))
          .select(log2($"r".cast("double")).as("x"),
            log2($"cnt".cast("double")).as("y"))
        val sums = xy.agg(
          count(lit(1)).cast("double").as("n"),
          dsum($"x").as("sx"), dsum($"y").as("sy"),
          dsum($"x" * $"y").as("sxy"), dsum($"x" * $"x").as("sxx"))
        sums.select(
          $"n".cast("long").as("n_ranks"),
          round(($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx") * 10000)
            .cast("long").as("slope_q"),
          round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
            ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n" * 10000)
            .cast("long").as("intercept_q"))
      },
      Some(s"""
        WITH tok AS (SELECT unnest($TOKS_SQL) AS w FROM documents),
        vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
        top AS (SELECT w, cnt FROM vocab ORDER BY cnt DESC, w LIMIT 1000),
        ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS r FROM top),
        xy AS (SELECT log2(CAST(r AS DOUBLE)) AS x, log2(CAST(cnt AS DOUBLE)) AS y FROM ranked),
        sums AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                        ${SUM("x")} AS sx, ${SUM("y")} AS sy,
                        ${SUM("x*y")} AS sxy, ${SUM("x*x")} AS sxx
                 FROM xy)
        SELECT CAST(n AS BIGINT) AS n_ranks,
               CAST(round((n*sxy - sx*sy)/(n*sxx - sx*sx) * 10000) AS BIGINT) AS slope_q,
               CAST(round((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx)/n * 10000) AS BIGINT) AS intercept_q
        FROM sums"""),
    ),

    // ---- t18: PII detection + redaction (regex class bank) ----
    // The scrubbing pass every training-data pipeline runs before release:
    // match PII classes (email, phone, SSN-shaped ids), count per class,
    // and replace with typed placeholders. The synthetic corpus carries no
    // ORGANIC PII, so the eval deterministically interleaves synthetic PII
    // derived from doc_id into each document first, then measures the
    // scrubber on the augmented text — counts per class, a residual-match
    // count on the REDACTED text (the invariant: zero — the scrubber
    // removed everything it can detect), and the redacted text's md5 so
    // the oracle hash proves byte-identical redaction. Patterns are
    // RE2/Java-compatible (no lookaround). Per-row narrow codegen'd regex
    // transforms — scan speed at 100 TB, no shuffle but the final sort.
    QueryDef(
      "t18_pii_redaction",
      (s, dir) => {
        import s.implicits._
        val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val PHONE = "\\+1-555-[0-9]{4}"
        val SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
        def nMatches(c: Column, re: String): Column =
          size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
        val aug = t(s, dir, "documents")
          .withColumn("augmented", concat(
            $"text", lit(" Contact user"), $"doc_id".cast("string"),
            lit("@example.com or call +1-555-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
            lit(" id "), lpad(((($"doc_id" * 7) % 1000)).cast("string"), 3, "0"),
            lit("-"), lpad(((($"doc_id" * 3) % 100)).cast("string"), 2, "0"),
            lit("-"), lpad(((($"doc_id" * 11) % 10000)).cast("string"), 4, "0")))
        aug
          .withColumn("redacted",
            regexp_replace(
              regexp_replace(
                regexp_replace($"augmented", EMAIL, "<EMAIL>"),
                PHONE, "<PHONE>"),
              SSN, "<ID>"))
          .select(
            $"doc_id",
            nMatches($"augmented", EMAIL).as("n_emails"),
            nMatches($"augmented", PHONE).as("n_phones"),
            nMatches($"augmented", SSN).as("n_ids"),
            (nMatches($"redacted", EMAIL) + nMatches($"redacted", PHONE) +
              nMatches($"redacted", SSN)).as("n_residual"),
            md5($"redacted").as("redacted_md5"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 text || ' Contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call +1-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' id ' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST((doc_id * 3) % 100 AS VARCHAR), 2, '0')
                   || '-' || lpad(CAST((doc_id * 11) % 10000 AS VARCHAR), 4, '0')
                   AS augmented
          FROM documents),
        red AS (
          SELECT doc_id, augmented,
                 regexp_replace(regexp_replace(regexp_replace(augmented,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
                   '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<ID>', 'g') AS redacted
          FROM aug)
        SELECT doc_id,
               CAST(len(regexp_extract_all(augmented, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(augmented, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(augmented, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ids,
               CAST(len(regexp_extract_all(redacted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(redacted, '\+1-555-[0-9]{4}'))
                 + len(regexp_extract_all(redacted, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_residual,
               md5(redacted) AS redacted_md5
        FROM red ORDER BY doc_id"""),
    ),

    // ---- t19: interpolated bigram surprisal (perplexity proxy) ----
    // The next step up from t16's unigram bits-per-token: score each doc
    // by its mean bigram surprisal under a Jelinek-Mercer-interpolated
    // corpus LM, p(w2|w1) = λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/T with λ=0.75
    // — the classic smoothed-bigram quality signal (low = fluent/templated
    // text the corpus has seen the transitions of; high = disfluent or
    // novel). Dataflow: the bigram MODEL is built once as a vocab-sized
    // table (bigram counts + prefix-marginal agg + one unigram join — all
    // linear, map-side combined), then the corpus joins bigrams→model in
    // a single shuffle, the same token→vocab cost center as t16 (AQE
    // skew-join or a broadcast top-K model at 100 TB). Probabilities are
    // exact-count ratios in an identical expression shape on both
    // engines; the per-doc mean routes through the ×10⁴ quantization
    // (t15's note) so log/summation ulps never reach the hash.
    QueryDef(
      "t19_bigram_surprisal",
      (s, dir) => {
        import s.implicits._

        // persisted: the bigram stream feeds BOTH the model build (bcnt)
        // and the final scoring join — without reuse each consumer re-ran
        // tokenize + ngrams + explode over the corpus (plain string
        // columns, so the columnar cache reads fast — unlike the
        // array<string> boundary the tokDocs note pins)
        val big = t(s, dir, "documents")
          .withColumn("toks", toks($"text"))
          .withColumn("grams", graft.functions.Shingles.ngrams(2)($"toks"))
          .select($"doc_id", explode($"grams").as("gram"))
          .persistOnce()
        val bcnt = big.groupBy($"gram").agg(count(lit(1)).as("c2"))
        val prefix = bcnt
          .withColumn("w1", substring_index($"gram", " ", 1))
          .groupBy($"w1").agg(sum($"c2").as("c1dot"))
        val uni = t(s, dir, "documents")
          .select(explode(toks($"text")).as("w"))
          .groupBy($"w").agg(count(lit(1)).as("cu"))
        val total = t(s, dir, "documents")
          .agg(sum(size(toks($"text"))).cast("double").as("total"))
        val model = bcnt
          .withColumn("w1", substring_index($"gram", " ", 1))
          .withColumn("w2", substring_index($"gram", " ", -1))
          .join(prefix, "w1")
          .join(uni.select($"w".as("w2"), $"cu"), "w2")
          .crossJoin(broadcast(total))
          .withColumn("p",
            lit(0.75) * $"c2".cast("double") / $"c1dot".cast("double") +
              lit(0.25) * $"cu".cast("double") / $"total")
          .select($"gram", $"p")
        big.join(model, "gram")
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            round(avg(-log2($"p")) * 10000).cast("long").as("surprisal_q"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH big AS (
          SELECT doc_id, unnest(list_transform(range(1, len($TOKS_SQL)),
                        i -> $TOKS_SQL[i] || ' ' || $TOKS_SQL[i+1])) AS gram
          FROM documents),
        bcnt AS (SELECT gram, COUNT(*) AS c2 FROM big GROUP BY gram),
        prefix AS (
          SELECT split_part(gram, ' ', 1) AS w1, SUM(c2) AS c1dot
          FROM bcnt GROUP BY 1),
        uni AS (
          SELECT w, COUNT(*) AS cu
          FROM (SELECT unnest($TOKS_SQL) AS w FROM documents) x GROUP BY w),
        tot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS total FROM uni),
        model AS (
          SELECT gram,
                 0.75 * CAST(c2 AS DOUBLE) / CAST(c1dot AS DOUBLE) +
                 0.25 * CAST(cu AS DOUBLE) / total AS p
          FROM bcnt
          JOIN prefix ON split_part(gram, ' ', 1) = w1
          JOIN uni ON split_part(gram, ' ', 2) = w
          CROSS JOIN tot)
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(round(AVG(-log2(p)) * 10000) AS BIGINT) AS surprisal_q
        FROM big JOIN model USING (gram)
        GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- t20: encoding-damage triage (mojibake / replacement / C1) ----
    // Crawl text arrives encoding-damaged in three canonical ways: UTF-8
    // double-decoding mojibake ('é' → 'Ã©': U+00C3 followed by a
    // U+00A0–U+00BF continuation-shaped char — repairable by re-encoding),
    // U+FFFD replacement chars (the decoder already destroyed the byte —
    // unrepairable), and C1 control chars U+0080–U+009F (a cp1252/latin-1
    // confusion signature). The corpus is clean ASCII, so — the t18
    // recipe — damage is INJECTED deterministically (doc_id mod 7 →
    // mojibake, mod 13 → U+FFFD, mod 11 → C1 NEL), then each doc is
    // counted per damage class, scored per kchar (integer arithmetic),
    // and triaged: drop (unrepairable bytes), fix (mojibake only — a
    // re-encode pass recovers it), keep. Per-row narrow regexp counts
    // inside whole-stage codegen, zero shuffles before the final sort —
    // the m01/t01 shape that scales to any corpus size.
    QueryDef(
      "t20_encoding_triage",
      (s, dir) => {
        import s.implicits._
        def nMatches(c: Column, re: String): Column =
          size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
        val aug = t(s, dir, "documents")
          .withColumn("t", concat(
            $"text",
            when($"doc_id" % 7 === 0,
              lit(" caf\u00c3\u00a9 na\u00c3\u00afve")).otherwise(lit("")),
            when($"doc_id" % 13 === 0,
              lit(" bad\ufffdbyte")).otherwise(lit("")),
            when($"doc_id" % 11 === 0,
              lit(" ctl\u0085x")).otherwise(lit(""))))
        aug
          .withColumn("n_moji", nMatches($"t", "\\x{00C3}[\\x{00A0}-\\x{00BF}]"))
          .withColumn("n_repl", nMatches($"t", "\\x{FFFD}"))
          .withColumn("n_c1", nMatches($"t", "[\\x{0080}-\\x{009F}]"))
          .select(
            $"doc_id", $"n_moji", $"n_repl", $"n_c1",
            expr("(n_moji*2 + n_repl*3 + n_c1) * 1000 DIV length(t)")
              .as("damage_per_kchar"),
            when($"n_repl" > 0 || $"n_c1" > 0, lit("drop"))
              .when($"n_moji" > 0, lit("fix"))
              .otherwise(lit("keep")).as("verdict"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 text ||
                 CASE WHEN doc_id % 7 = 0
                      THEN ' caf' || chr(195) || chr(169) || ' na' || chr(195) || chr(175) || 've'
                      ELSE '' END ||
                 CASE WHEN doc_id % 13 = 0 THEN ' bad' || chr(65533) || 'byte' ELSE '' END ||
                 CASE WHEN doc_id % 11 = 0 THEN ' ctl' || chr(133) || 'x' ELSE '' END AS t
          FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(t, '\x{00C3}[\x{00A0}-\x{00BF}]')) AS BIGINT) AS n_moji,
                 CAST(len(regexp_extract_all(t, '\x{FFFD}')) AS BIGINT) AS n_repl,
                 CAST(len(regexp_extract_all(t, '[\x{0080}-\x{009F}]')) AS BIGINT) AS n_c1,
                 CAST(length(t) AS BIGINT) AS n
          FROM aug)
        SELECT doc_id, n_moji, n_repl, n_c1,
               (n_moji*2 + n_repl*3 + n_c1) * 1000 // n AS damage_per_kchar,
               CASE WHEN n_repl > 0 OR n_c1 > 0 THEN 'drop'
                    WHEN n_moji > 0 THEN 'fix'
                    ELSE 'keep' END AS verdict
        FROM m ORDER BY doc_id"""),
    ),

    // ---- t21: BPE merge training (the distributed tokenizer-training loop) ----
    // Classic byte-pair-encoding training over the WORD-FREQUENCY table —
    // the actual dataflow every BPE/WordPiece tokenizer build runs: start
    // from characters, repeatedly (a) count adjacent symbol pairs weighted
    // by word frequency, (b) pick the most frequent pair (ties broken by
    // lexicographically smallest — both engines spell the same rule, no
    // order-dependent argmax), (c) fuse that pair everywhere. Output = the
    // learned merge list, the artifact a tokenizer ships.
    //
    // Scale shape: the state is the VOCAB table (unique words + freq),
    // never the corpus — one corpus-linear tokenize feeds a word hash-agg,
    // after which each of the K iterations is (vocab-linear pair explode →
    // map-side-combined hash agg) + (ONE-ROW best-pair aggregate via
    // min(struct(-cnt, pair)), joined back on a constant key = broadcast,
    // no cartesian) + a per-row literal replace. Each iteration is
    // localCheckpoint'd eagerly (the p03 contraction pattern) so the K-deep
    // loop never re-derives lineage — at 100 TB the corpus is touched
    // exactly once and the loop runs on the ~10⁶-row vocab regardless of
    // corpus size. The padded-seq literal replace (' a b ' → ' ab ') is
    // left-to-right non-overlapping in both engines, so 'a a a' fuses to
    // '(aa) a' identically.
    QueryDef(
      "t21_bpe_merges",
      (s, dir) => {
        import s.implicits._
        bpeTrain(s, dir)._1.orderBy($"it")
      },
      Some(bpeOracle(BPE_MERGES)),
    ),

    // ---- t22: BPE encoding — APPLY the t21-trained merges to the corpus ----
    // The other half of the tokenizer loop: training produces the merge
    // list, but what the pipeline runs nightly is ENCODING — every
    // document segmented by the trained vocab, yielding the real
    // pieces-per-word compression the token budget is planned around
    // (t07's regex count is the pre-training estimate; this is the
    // trained tokenizer's actual number). Reuses the ONE cached t21
    // training result (the dupClusterLabels sharing pattern): the final
    // vocab maps each word to its merged piece sequence, and encoding is
    // the corpus token stream joined to that BROADCAST vocab — the
    // corpus-sized side never shuffles, exactly how a tokenizer ships
    // (model table to every worker, one narrow pass over the text).
    // Integer-exact: piece counts and a x10^4-quantized pieces-per-word.
    QueryDef(
      "t22_bpe_encode",
      (s, dir) => {
        import s.implicits._
        val vocab = bpeTrain(s, dir)._2
          .withColumn("np", size(split(trim($"seq"), " ")).cast("long"))
          .select($"word", $"np")
        t(s, dir, "documents")
          .select($"doc_id", explode(
            regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).as("word"))
          .join(broadcast(vocab), "word")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_words"), sum($"np").as("n_pieces"))
          .select($"doc_id", $"n_words", $"n_pieces",
            expr("n_pieces * 10000 div n_words").as("ppw_q"))
          .orderBy($"doc_id")
      },
      Some(s"""${bpeCtes(BPE_MERGES)},
        docw AS (
          SELECT doc_id, unnest($TOKS_SQL) AS word
          FROM documents),
        enc AS (
          SELECT d.doc_id,
                 CAST(len(string_split(trim(v.seq), ' ')) AS BIGINT) AS np
          FROM docw d JOIN v$BPE_MERGES v USING (word))
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(np) AS BIGINT) AS n_pieces,
               CAST(SUM(np) AS BIGINT) * 10000 // COUNT(*) AS ppw_q
        FROM enc GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- t23: cross-source KL divergence — the domain-shift monitor ----
    // KL(a‖b) between every ordered pair of sources' unigram
    // distributions (add-one smoothing over the GLOBAL vocab, so zero
    // counts are defined and the sum runs over the same support for every
    // pair) — the corpus-composition drift matrix: a new crawl snapshot
    // whose divergence row jumps is the first sign its content changed.
    // Dataflow: the corpus is touched ONCE (the per-(source, word) count
    // aggregate); everything after is vocab-sized — the smoothed
    // distribution grid is vocab × sources, and the pair matrix joins it
    // to itself on the word key (vocab × sources² rows, sources in the
    // tens — corpus-INDEPENDENT, like t21's vocab-linear iterations).
    // Quantized ×10⁶ after the sum: the per-term products are O(1e-3),
    // so double reassociation error (~1e-13·V) sits far below the
    // quantization step — the t16/t17 precedent for log-domain outputs.
    QueryDef(
      "t23_source_kl",
      (s, dir) => {
        import s.implicits._
        val tok = t(s, dir, "documents")
          .select($"source", explode(toks($"text")).as("w"))
        // persisted: the dist frame feeds BOTH sides of the pair self-join,
        // and without the cache each side re-runs the corpus tokenize (the
        // only corpus-sized pass here; cs itself is vocab × sources)
        val cs = tok.groupBy($"source", $"w").agg(count(lit(1)).as("c"))
          .persistOnce()
        val tot = cs.groupBy($"source").agg(sum($"c").as("tot"))
        val vocab = cs.select($"w").distinct()
        val vsize = vocab.agg(count(lit(1)).as("v"))
        val dist = vocab.crossJoin(broadcast(tot))
          .join(cs, Seq("source", "w"), "left")
          .crossJoin(broadcast(vsize))
          .select($"source", $"w",
            ((coalesce($"c", lit(0L)) + lit(1L)).cast("double") /
              ($"tot" + $"v").cast("double")).as("p"))
        dist.as("a")
          .join(dist.as("b"),
            $"a.w" === $"b.w" && $"a.source" =!= $"b.source")
          .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
          .agg(round(sum($"a.p" * (log($"a.p") - log($"b.p"))) * 1000000)
            .cast("long").as("kl_q"))
          .orderBy($"src_a", $"src_b")
      },
      Some(s"""
        WITH tok AS (SELECT source, unnest($TOKS_SQL) AS w FROM documents),
        cs AS (SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w),
        tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM cs GROUP BY source),
        vocab AS (SELECT DISTINCT w FROM cs),
        vs AS (SELECT COUNT(*) AS v FROM vocab),
        dist AS (
          SELECT t.source, vb.w,
                 CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) / CAST(t.tot + vs.v AS DOUBLE) AS p
          FROM vocab vb CROSS JOIN tot t CROSS JOIN vs
          LEFT JOIN cs c ON c.source = t.source AND c.w = vb.w)
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(round(SUM(a.p * (ln(a.p) - ln(b.p))) * 1000000) AS BIGINT) AS kl_q
        FROM dist a JOIN dist b ON a.w = b.w AND a.source <> b.source
        GROUP BY a.source, b.source ORDER BY src_a, src_b"""),
    ),

    // ---- t24: term burstiness — topical vs function words ----
    // Church & Gale's observation: a term's corpus frequency alone can't
    // separate topical words from function words, but its BURSTINESS —
    // mean occurrences per document that CONTAINS it (cf/df) — can: "the"
    // appears once or twice everywhere, a topical term clumps hard inside
    // the few documents about it. The keyword-extraction prior behind
    // tf-idf variants, and the signal t11's per-source salience doesn't
    // carry (t11 ranks by where a term concentrates, t24 by how it
    // clumps). Exact integer ×10⁴ ratio; df ≥ 5 floors out hapax noise.
    // Shape: one token explode + ONE hash-agg computing cf and df
    // together (count + count-distinct over the same key, map-side
    // partially aggregated), then a global top-30 via TakeOrdered — no
    // window, no join, vocabulary-sized intermediate.
    QueryDef(
      "t24_term_burstiness",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", explode(toks($"text")).as("w"))
          .groupBy($"w")
          .agg(count(lit(1)).as("cf"), countDistinct($"doc_id").as("df"))
          .filter($"df" >= 5L)
          .withColumn("burst_q", expr("cf * 10000 div df"))
          .orderBy($"burst_q".desc, $"w")
          .limit(30)
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest($TOKS_SQL) AS w FROM documents),
        stats AS (
          SELECT w, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
          FROM tok GROUP BY w)
        SELECT w, cf, df, cf * 10000 // df AS burst_q
        FROM stats WHERE df >= 5
        ORDER BY burst_q DESC, w LIMIT 30"""),
    ),

    // ---- t25: vocabulary growth curves — Heaps'-law companion to t17 ----
    // The tokenizer-sizing question t17's Zipf slope doesn't answer: how
    // fast does each source's TYPE count grow with token supply? (Heaps:
    // V ≈ k·Nᵝ — a source whose curve is still steep at full size will
    // blow past a fixed vocab budget as the corpus grows.) Checkpoints
    // are NESTED DETERMINISTIC SAMPLES — docs whose shared md5 percent
    // bucket (the Sampling rule) falls under 25/50/75/100 — so the curve
    // needs NO per-source rank window and no ordering at all: ONE token
    // explode cross-joined with the 4-row checkpoint table, aggregated
    // by (source, pct) with conditional count-distincts. Growth between
    // checkpoints is exactly what a distributed engine can add corpus
    // increments to (each checkpoint is a superset sample); everything
    // is one map-side-combinable agg over tokens×4.
    QueryDef(
      "t25_vocab_growth",
      (s, dir) => {
        import s.implicits._
        val cp = s.range(1, 5).select(($"id" * 25L).as("pct"))
        // Pre-aggregate, then sweep the checkpoints: the direct form
        // cross-joined the token stream 4x and ran THREE count-distincts
        // in one aggregate (Spark's multi-distinct Expand triples the
        // rows again — 12x the corpus through one exchange). Because the
        // checkpoints are NESTED samples, a type is present at pct iff
        // its MINIMUM doc bucket < pct — so one (source, w) -> min(b)
        // aggregate (map-side combined, corpus shuffled once) plus a
        // per-doc count frame replace the whole Expand; the 4-way
        // checkpoint sweep then runs over vocab-/doc-sized frames. Same
        // integers by construction.
        val tokStream = t(s, dir, "documents")
          .select($"doc_id", $"source",
            graft.analytics.Sampling.pctBucket($"doc_id").as("b"),
            explode(toks($"text")).as("w"))
        val wmb = tokStream.groupBy($"source", $"w").agg(min($"b").as("mb"))
        val types = wmb.crossJoin(broadcast(cp))
          .groupBy($"source", $"pct")
          .agg(count(when($"mb" < $"pct", lit(1))).as("n_types"))
        val dstats = t(s, dir, "documents")
          .select($"source", graft.analytics.Sampling.pctBucket($"doc_id").as("b"),
            size(toks($"text")).cast("long").as("nt"))
          .filter($"nt" >= 1L) // the token stream never sees 0-token docs
          .crossJoin(broadcast(cp))
          .groupBy($"source", $"pct")
          .agg(count(when($"b" < $"pct", lit(1))).as("n_docs"),
            sum(when($"b" < $"pct", $"nt").otherwise(0L)).as("n_tokens"))
        dstats.join(types, Seq("source", "pct"))
          .select($"source", $"pct", $"n_docs", $"n_tokens", $"n_types")
          .orderBy($"source", $"pct")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, source,
                 ${graft.analytics.Sampling.pctBucketSql("doc_id")} AS b,
                 unnest($TOKS_SQL) AS w
          FROM documents),
        cp AS (SELECT unnest([CAST(25 AS BIGINT), CAST(50 AS BIGINT),
                              CAST(75 AS BIGINT), CAST(100 AS BIGINT)]) AS pct)
        SELECT source, pct,
               COUNT(DISTINCT CASE WHEN b < pct THEN doc_id END) AS n_docs,
               COUNT(CASE WHEN b < pct THEN 1 END) AS n_tokens,
               COUNT(DISTINCT CASE WHEN b < pct THEN w END) AS n_types
        FROM tok CROSS JOIN cp
        GROUP BY source, pct ORDER BY source, pct"""),
    ),

    // ---- t26: overlapping chunk windows + cross-doc chunk dedup ----
    // Chunk definition factored into [[chunkStructs]] (shared with the
    // ingestion-time chunk gate `streaming/IngestChunkDedup`, so batch
    // and stream agree bit-for-bit — the tileHashes pattern).
    // The RAG/pretraining CHUNKER: every document splits into 64-token
    // windows at stride 48 (16-token overlap keeps context across cuts —
    // the standard retrieval-chunking shape), each chunk gets a stable
    // content hash, and a chunk whose exact token window already occurred
    // earlier in the corpus (first occurrence = min (doc, idx) key) flags
    // as a duplicate — the memorization-control signal chunk-level
    // training dedup acts on, catching repeated passages (licenses,
    // boilerplate, syndicated paragraphs) that document-level dedup
    // misses inside otherwise-distinct documents. Scale shape: the window
    // fan-out is a per-row narrow transform (sequence + slice inside
    // codegen, ~n/48 chunks per doc), first-occurrence is ONE hash-agg on
    // the chunk hash, and the dup flag joins back on that same key — both
    // sides hash-partitioned on chunk_hash, no window over the corpus,
    // no sort until the final (report-sized) ordering.
    QueryDef(
      "t26_chunk_windows",
      (s, dir) => {
        import s.implicits._
        val ch = chunkStructs(t(s, dir, "documents"))
          .select($"doc_id", posexplode($"chunks").as(Seq("chunk_idx", "c")))
          .withColumn("chunk_idx", $"chunk_idx".cast("long"))
          .withColumn("n_chunk_tokens", $"c.nt")
          .withColumn("chunk_hash", $"c.h")
          // total order on occurrences without a struct-min (the oracle
          // has no struct MIN): chunk_idx < 100000 by construction, so
          // the arithmetic key preserves (doc_id, chunk_idx) order
          .withColumn("k", $"doc_id" * 100000L + $"chunk_idx")
        val first = ch.groupBy($"chunk_hash").agg(min($"k").as("k0"))
        ch.join(first, "chunk_hash")
          .select($"doc_id", $"chunk_idx", $"n_chunk_tokens", $"chunk_hash",
            ($"k" =!= $"k0").as("dup"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, $TOKS_SQL AS tk FROM documents),
        c0 AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
               FROM d WHERE len(tk) > 0),
        ix AS (SELECT doc_id, tk, n,
                      unnest(range(greatest(CAST(ceil((n - 64) / 48.0) AS BIGINT),
                                            0) + 1)) AS chunk_idx
               FROM c0),
        ch AS (SELECT doc_id, chunk_idx,
                      list_slice(tk, CAST(chunk_idx*48 + 1 AS BIGINT),
                                 CAST(least(chunk_idx*48 + 64, n) AS BIGINT)) AS ctk,
                      doc_id*100000 + chunk_idx AS k
               FROM ix),
        h AS (SELECT doc_id, chunk_idx, CAST(len(ctk) AS BIGINT) AS n_chunk_tokens,
                     md5(array_to_string(ctk, ' ')) AS chunk_hash, k
              FROM ch),
        f AS (SELECT chunk_hash, MIN(k) AS k0 FROM h GROUP BY chunk_hash)
        SELECT doc_id, chunk_idx, n_chunk_tokens, chunk_hash, (k <> k0) AS dup
        FROM h JOIN f USING (chunk_hash)
        ORDER BY doc_id, chunk_idx"""),
    ),

    // ---- t27: context-length budget (truncate / pad / pack planning) ----
    // The sizing question every pretraining run answers before launch: at
    // context length C, how many documents truncate, how many tokens are
    // lost to truncation, how much of each batch is padding if documents
    // map one-per-sequence, and what is the perfect-packing lower bound on
    // sequence count (the number a greedy packer is judged against). One
    // row per candidate C in {512, 1024, 2048, 4096}. Ratios are exact
    // integer ppm (BIGINT throughout — the ×1e6 numerators hold to ~9e12
    // corpus tokens per aggregate; beyond that, shard the corpus first and
    // sum the raw token columns, which never overflow). Scale shape: ONE
    // corpus-linear tokenize pass fanned out ×4 against a broadcast 4-row
    // frame, then a map-side-combinable aggregate onto a 4-key space — no
    // window, no pair join, nothing corpus×corpus.
    QueryDef(
      "t27_context_budget",
      (s, dir) => {
        import s.implicits._
        val nt = t(s, dir, "documents")
          .select(size(toks($"text")).cast("long").as("nt"))
        val ctxs = s.range(1).select(
          explode(array(Seq(512L, 1024L, 2048L, 4096L).map(lit): _*)).as("ctx"))
        nt.crossJoin(broadcast(ctxs))
          .groupBy($"ctx")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"nt" > $"ctx", 1L).otherwise(0L)).as("n_truncated"),
            sum($"nt").as("tokens_total"),
            sum(least($"nt", $"ctx")).as("tokens_kept"))
          .select($"ctx", $"n_docs", $"n_truncated", $"tokens_total", $"tokens_kept",
            expr("(tokens_total - tokens_kept) * 1000000 div tokens_total")
              .as("trunc_loss_ppm"),
            expr("(ctx * n_docs - tokens_kept) * 1000000 div (ctx * n_docs)")
              .as("pad_waste_ppm"),
            expr("(tokens_kept + ctx - 1) div ctx").as("packed_seqs_lb"))
          .orderBy($"ctx")
      },
      Some(s"""
        WITH nt AS (
          SELECT CAST(len($TOKS_SQL) AS BIGINT) AS nt FROM documents),
        c AS (SELECT CAST(unnest([512, 1024, 2048, 4096]) AS BIGINT) AS ctx),
        g AS (
          SELECT ctx, COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN nt > ctx THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_truncated,
                 CAST(SUM(nt) AS BIGINT) AS tokens_total,
                 CAST(SUM(least(nt, ctx)) AS BIGINT) AS tokens_kept
          FROM nt CROSS JOIN c GROUP BY ctx)
        SELECT ctx, n_docs, n_truncated, tokens_total, tokens_kept,
               (tokens_total - tokens_kept) * 1000000 // tokens_total
                 AS trunc_loss_ppm,
               (ctx * n_docs - tokens_kept) * 1000000 // (ctx * n_docs)
                 AS pad_waste_ppm,
               (tokens_kept + ctx - 1) // ctx AS packed_seqs_lb
        FROM g ORDER BY ctx"""),
    ),
  )

  /** The t21 training loop, cached per (session, dir) and shared with the
    * t22 encoder: returns (merge list, final vocab word→seq). One corpus
    * tokenize, then K vocab-sized iterations, localCheckpoint'd so the
    * K-deep lineage never re-derives (see the t21 scaladoc for the 100 TB
    * argument). */
  private val bpeCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    bpeCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      var vocab: org.apache.spark.sql.DataFrame = t(s, dir, "documents")
        .select(explode(
          regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
        .withColumn("seq",
          concat(lit(" "), trim(regexp_replace($"word", "(.)", "$1 ")), lit(" ")))
        .materialized
      val merges = (1 to BPE_MERGES).map { it =>
        val pairs = vocab
          .withColumn("toks", split(trim($"seq"), " "))
          .withColumn("pair", explode(expr(
            """CASE WHEN size(toks) >= 2
               THEN transform(sequence(0, size(toks)-2),
                      i -> concat(element_at(toks, i+1), ' ', element_at(toks, i+2)))
               ELSE array() END""")))
          .groupBy($"pair").agg(sum($"freq").as("cnt"))
        val best = pairs
          .agg(min(struct((-$"cnt").as("nc"), $"pair".as("p"))).as("m"))
          .select($"m.p".as("pair"), (-$"m.nc").as("cnt"))
          .materialized
        vocab = vocab.withColumn("k", lit(1))
          .join(best.select($"pair", lit(1).as("k")), "k")
          .withColumn("seq", expr(
            "replace(seq, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')"))
          .select($"word", $"freq", $"seq")
          .materialized
        best.select(lit(it.toLong).as("it"), $"pair",
          regexp_replace($"pair", " ", "").as("new_token"), $"cnt".as("pair_count"))
      }
      (merges.reduce(_ unionAll _).materialized, vocab)
    })

  /** Number of t21 merge iterations — enough to exercise merged symbols
    * re-merging (learned tokens growing past 2 chars). `final` + literal
    * makes it a compile-time constant: `defs` above references it during
    * object init, BEFORE a plain val here would be assigned. */
  private final val BPE_MERGES = 6

  /** The unrolled training CTE chain `WITH tok … v$k` (DuckDB has no
    * loop — each layer is the literal SQL of one Spark iteration).
    * Shared by the t21 (merge list) and t22 (encode) oracles. */
  private def bpeCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
        WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS word
          FROM documents),
        w AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY word),
        v0 AS (SELECT word, freq,
                      ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS seq
               FROM w)"""
    for (i <- 1 to k) {
      sb ++= s""",
        p$i AS (
          SELECT pr AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT freq,
                   unnest(list_transform(range(len(t)-1),
                     x -> t[CAST(x+1 AS INT)] || ' ' || t[CAST(x+2 AS INT)])) AS pr
            FROM (SELECT freq, string_split(trim(seq), ' ') AS t FROM v${i - 1}) z) y
          GROUP BY pr),
        b$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
        v$i AS (
          SELECT word, freq,
                 replace(seq, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ') AS seq
          FROM v${i - 1} CROSS JOIN b$i)"""
    }
    sb.toString
  }

  /** The t21 oracle: the training chain plus the merge-list projection. */
  private def bpeOracle(k: Int): String =
    bpeCtes(k) + (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS it, pair, replace(pair, ' ', '') AS new_token, " +
        s"cnt AS pair_count FROM b$i")
      .mkString("\n        ", "\n        UNION ALL\n        ", "\n        ORDER BY it")
}
