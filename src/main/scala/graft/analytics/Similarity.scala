package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (Array[Float], 64 dims).
  *
  * Numeric determinism: float elements are quantized to integers
  * (round(x·2^20) — `round` is half-away-from-zero in BOTH Spark and DuckDB,
  * unlike double→decimal casts which are HALF_UP in Spark but half-even in
  * DuckDB). Dot products and norms are then exact BIGINT arithmetic
  * (≤ 64·2^40 < 2^53, so the final double conversion is exact), making every
  * cosine bit-identical to the DuckDB oracle. The 2^-20 scaling cancels in
  * the cosine ratio.
  *
  * Scale notes (100 TB):
  *  - s01 is the brute-force baseline: broadcast the (small) query set,
  *    scan the corpus once, per-query top-k via window — no corpus
  *    self-shuffle;
  *  - s02 is the scale path: random-hyperplane (Rademacher/SimHash-style)
  *    LSH — each vector maps to an 8-bit bucket, candidates share a bucket,
  *    so the join shuffles on a fixed-width key instead of all pairs; the
  *    hyperplane signs derive from md5(p-d) so the oracle can replay them.
  */
object Similarity {
  import Tables.t

  private val DIMS = 64
  private val PLANES = 8
  private val QUANT = 1L << 20

  /** Quantize Array[Float] → Array[Long] (exact in both engines). */
  private def quantized(e: Column): Column =
    transform(e, x => round(x.cast("double") * QUANT).cast("long"))

  private val Q_SQL =
    s"list_transform(embedding, x -> CAST(round(x::DOUBLE * $QUANT) AS BIGINT))"

  private def sumLong(products: Column): Column =
    aggregate(products, lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm. */
  private def norm2(q: Column): Column = sumLong(transform(q, x => x * x))

  private def dotInt(a: String, b: String): Column =
    sumLong(zip_with(col(a), col(b), (x, y) => x * y))

  /** cos = dot / sqrt(n2a·n2b) — same expression shape as the oracle. */
  private def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double") * n2b.cast("double"))

  /** Rademacher hyperplane sign for (plane, dim), derived from md5 so the
    * DuckDB oracle reproduces it: +1 iff the first hex digit of
    * md5("p-d") has its high bit set. */
  private[analytics] def planeSign(p: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p-$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ("89abcdef".contains(hex.charAt(0))) 1 else -1
  }

  private val SIGNS_SQL = """
    signs AS (SELECT p, d,
      CASE WHEN instr('89abcdef', substr(md5(CAST(p AS VARCHAR)||'-'||CAST(d AS VARCHAR)), 1, 1)) > 0
           THEN 1 ELSE -1 END AS w
      FROM (SELECT unnest(range(8)) AS p) pp CROSS JOIN (SELECT unnest(range(64)) AS d) dd)"""

  /** Common DuckDB prelude: quantized vectors + integer norms. */
  private val QNORM_SQL = s"""
        qv AS (SELECT vec_id, label, $Q_SQL AS q FROM embeddings),
        norms AS (
          SELECT vec_id, CAST(SUM(q[i+1]*q[i+1]) AS BIGINT) AS n2
          FROM qv CROSS JOIN (SELECT unnest(range(64)) AS i) dims GROUP BY vec_id)"""

  private def withQNorm(df: DataFrame): DataFrame = {
    val q = quantized(col("embedding"))
    df.withColumn("q", q).withColumn("n2", norm2(col("q")))
  }

  /** 8-bit random-hyperplane LSH bucket of the quantized vector column
    * `q` (shared by s02 and d06). */
  private def bucketCol: Column = (0 until PLANES).map { p =>
    val signArr = array((0 until DIMS).map(d => lit(planeSign(p, d).toLong)): _*)
    val proj = sumLong(zip_with(col("q"), signArr, (x, w) => x * w))
    when(proj > 0L, lit(1 << p)).otherwise(lit(0))
  }.reduce(_ + _)

  /** IVF top-k search, shared by s05 (the operator) and s06 (its recall
    * eval). Coarse quantizer: the first NLIST vectors serve as
    * deterministic centroids (a seeded stand-in for k-means — the oracle
    * can replay it; the IVF *plumbing* is identical either way). List
    * assignment joins every corpus vector to the BROADCAST centroid set
    * and keeps its argmax-cosine list — a narrow map over the corpus scan,
    * no corpus self-shuffle (the 100 TB index-build pass). Each query
    * probes only its NPROBE nearest lists; the probe set is broadcast so
    * the corpus-sized assigned side never shuffles. */
  private def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val NLIST = 8
    val NPROBE = 2
    val emb = withQNorm(t(s, dir, "embeddings"))
    val cent = emb.filter($"vec_id" < NLIST)
      .select($"vec_id".as("cent_id"), $"q".as("qc"), $"n2".as("n2c"))
    val corpus = emb.filter($"vec_id" >= NLIST)
      .select($"vec_id".as("cid"), $"q".as("qb"), $"n2".as("n2b"))
    val wA = Window.partitionBy($"cid").orderBy($"ccos".desc, $"cent_id")
    val assigned = corpus.join(broadcast(cent))
      .withColumn("ccos", cosine(dotInt("qc", "qb"), $"n2c", $"n2b"))
      .withColumn("ar", row_number().over(wA)).filter($"ar" === 1)
      .select($"cid", $"qb", $"n2b", $"cent_id")
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"q".as("qa"), $"n2".as("n2a"))
    val wP = Window.partitionBy($"qid").orderBy($"pcos".desc, $"cent_id")
    val probes = q.join(broadcast(cent))
      .withColumn("pcos", cosine(dotInt("qc", "qa"), $"n2c", $"n2a"))
      .withColumn("pr", row_number().over(wP)).filter($"pr" <= NPROBE)
      .select($"qid", $"qa", $"n2a", $"cent_id")
    val wT = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
    broadcast(probes).join(assigned, "cent_id")
      .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
      .withColumn("rn", row_number().over(wT)).filter($"rn" <= 10)
      .select($"qid", $"cid", $"cos", $"rn")
  }

  /** The IVF search as DuckDB CTEs ending in `ivf(qid, cid, cos, rn)` —
    * appended after dims/QNORM_SQL by s05 and s06. */
  private val IVF_CTES = """
        cent AS (SELECT vec_id AS cent_id, q FROM qv WHERE vec_id < 8),
        cdots AS (
          SELECT v.vec_id, c.cent_id, CAST(SUM(v.q[i+1]*c.q[i+1]) AS BIGINT) AS dot
          FROM qv v CROSS JOIN cent c CROSS JOIN dims
          GROUP BY v.vec_id, c.cent_id),
        ccos AS (
          SELECT d.vec_id, d.cent_id,
                 CAST(dot AS DOUBLE)/sqrt(CAST(nv.n2 AS DOUBLE)*CAST(nc.n2 AS DOUBLE)) AS ccos
          FROM cdots d JOIN norms nv ON nv.vec_id = d.vec_id
               JOIN norms nc ON nc.vec_id = d.cent_id),
        assign AS (
          SELECT vec_id AS cid, cent_id FROM (
            SELECT vec_id, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS ar
            FROM ccos WHERE vec_id >= 8) x
          WHERE ar = 1),
        probes AS (
          SELECT vec_id AS qid, cent_id FROM (
            SELECT vec_id, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS pr
            FROM ccos WHERE vec_id < 5) x
          WHERE pr <= 2),
        cands AS (
          SELECT DISTINCT p.qid, a.cid
          FROM probes p JOIN assign a ON a.cent_id = p.cent_id),
        pdots AS (
          SELECT c.qid, c.cid, CAST(SUM(qa.q[i+1]*qb.q[i+1]) AS BIGINT) AS dot
          FROM cands c JOIN qv qa ON qa.vec_id = c.qid JOIN qv qb ON qb.vec_id = c.cid
          CROSS JOIN dims GROUP BY c.qid, c.cid),
        ivf AS (
          SELECT qid, cid, cos, rn FROM (
            SELECT d.qid, d.cid,
                   CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) AS cos,
                   ROW_NUMBER() OVER (PARTITION BY d.qid ORDER BY
                     CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) DESC,
                     d.cid) AS rn
            FROM pdots d JOIN norms na ON na.vec_id = d.qid JOIN norms nb ON nb.vec_id = d.cid) r
          WHERE rn <= 10)"""

  val defs: Seq[QueryDef] = Seq(
    // ---- s01: brute-force cosine top-k (baseline) ----
    QueryDef(
      "s01_ann_bruteforce_topk",
      (s, dir) => {
        import s.implicits._
        val emb = withQNorm(t(s, dir, "embeddings"))
        val q = emb.filter($"vec_id" < 5)
          .select($"vec_id".as("qid"), $"q".as("qa"), $"n2".as("n2a"))
        val c = emb.filter($"vec_id" >= 5)
          .select($"vec_id".as("cid"), $"q".as("qb"), $"n2".as("n2b"))
        val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
        c.join(broadcast(q))
          .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 10)
          .select($"qid", $"cid", $"cos", $"rn")
          .orderBy($"qid", $"rn")
      },
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $QNORM_SQL,
        dots AS (
          SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(SUM(a.q[i+1]*b.q[i+1]) AS BIGINT) AS dot
          FROM qv a JOIN qv b ON a.vec_id < 5 AND b.vec_id >= 5
          CROSS JOIN dims GROUP BY a.vec_id, b.vec_id),
        scored AS (
          SELECT qid, cid,
                 CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) AS cos
          FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid),
        ranked AS (
          SELECT qid, cid, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          FROM scored)
        SELECT qid, cid, cos, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn"""),
    ),

    // ---- s02: LSH-bucketed near-duplicate vectors (scale path) ----
    QueryDef(
      "s02_lsh_neardup_vectors",
      (s, dir) => {
        import s.implicits._
        val emb = withQNorm(t(s, dir, "embeddings")).withColumn("bucket", bucketCol)
        val a = emb.select($"vec_id".as("i"), $"q".as("qa"), $"n2".as("n2a"), $"bucket")
        val b = emb.select($"vec_id".as("j"), $"q".as("qb"), $"n2".as("n2b"),
          $"bucket".as("bucket_b"))
        // threshold 0.35: the synthetic embeddings are random, so genuinely
        // near-identical pairs don't exist — 0.8 returned an (always-
        // trivially-matching) empty set; 0.35 keeps the check non-trivial
        a.join(b, $"bucket" === $"bucket_b" && $"i" < $"j")
          .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
          .filter($"cos" >= 0.35)
          .select($"i", $"j", $"cos")
          .orderBy($"i", $"j")
      },
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $SIGNS_SQL,
        $QNORM_SQL,
        projs AS (
          SELECT vec_id, p, CAST(SUM(q[d+1]*w) AS BIGINT) AS proj
          FROM qv CROSS JOIN signs GROUP BY vec_id, p),
        buckets AS (
          SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
          FROM projs GROUP BY vec_id),
        cands AS (
          SELECT a.vec_id AS i, b.vec_id AS j
          FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        dots AS (
          SELECT c.i, c.j, CAST(SUM(qa.q[dims.i+1]*qb.q[dims.i+1]) AS BIGINT) AS dot
          FROM cands c JOIN qv qa ON qa.vec_id = c.i JOIN qv qb ON qb.vec_id = c.j
          CROSS JOIN dims GROUP BY c.i, c.j)
        SELECT d.i, d.j,
               CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) AS cos
        FROM dots d JOIN norms na ON na.vec_id = d.i JOIN norms nb ON nb.vec_id = d.j
        WHERE CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) >= 0.35
        ORDER BY d.i, d.j"""),
    ),

    // ---- s05: IVF coarse-quantized ANN (inverted-file probe search) ----
    QueryDef(
      "s05_ivf_ann",
      (s, dir) => ivfTopK(s, dir)
        .select(col("qid"), col("cid"), col("cos"), col("rn"))
        .orderBy(col("qid"), col("rn")),
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $QNORM_SQL,
        $IVF_CTES
        SELECT qid, cid, cos, rn FROM ivf ORDER BY qid, rn"""),
    ),

    // ---- s06: ANN recall@k — the IVF index evaluated against exact ----
    // ---- ground truth (the accept/reject gate for any ANN rollout)  ----
    // Exact and IVF top-10 run over the SAME corpus/query split; recall is
    // the per-query intersection count (integers — hash-stable). Ground
    // truth is the brute-force plan (broadcast query side), the IVF side
    // reuses the s05 build; the join moves only 2×(queries×k) rows.
    QueryDef(
      "s06_ivf_recall",
      (s, dir) => {
        import s.implicits._
        val emb = withQNorm(t(s, dir, "embeddings"))
        val q = emb.filter($"vec_id" < 5)
          .select($"vec_id".as("qid"), $"q".as("qa"), $"n2".as("n2a"))
        val corpus = emb.filter($"vec_id" >= 8)
          .select($"vec_id".as("cid"), $"q".as("qb"), $"n2".as("n2b"))
        val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
        val exact = corpus.join(broadcast(q))
          .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
          .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
          .select($"qid", $"cid")
        val ivf = ivfTopK(s, dir).select($"qid", $"cid")
        val hits = exact.join(ivf, Seq("qid", "cid"), "left_semi")
          .groupBy($"qid").agg(count(lit(1)).as("hits"))
        exact.select($"qid").distinct()
          .join(hits, Seq("qid"), "left")
          .na.fill(0L, Seq("hits"))
          .withColumn("k", lit(10))
          .orderBy($"qid")
      },
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $QNORM_SQL,
        $IVF_CTES,
        edots AS (
          SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(SUM(a.q[i+1]*b.q[i+1]) AS BIGINT) AS dot
          FROM qv a JOIN qv b ON a.vec_id < 5 AND b.vec_id >= 8
          CROSS JOIN dims GROUP BY a.vec_id, b.vec_id),
        exact AS (
          SELECT qid, cid FROM (
            SELECT qid, cid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                     CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) DESC,
                     cid) AS rn
            FROM edots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid) x
          WHERE rn <= 10)
        SELECT e.qid,
               CAST(COALESCE(SUM(CASE WHEN i.cid IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits,
               10 AS k
        FROM exact e LEFT JOIN ivf i ON i.qid = e.qid AND i.cid = e.cid
        GROUP BY e.qid ORDER BY e.qid"""),
    ),

    // ---- d06: embedding-cosine near-dup docs (cross-table enrichment) ---
    // The dedup flavor that works on the embedding space instead of text:
    // LSH-bucketed candidate pairs (same plumbing as s02), verified by
    // exact integer cosine, then joined BACK to `documents` for dedup
    // policy inputs (same source? same language?). At 100 TB the doc join
    // shuffles only the surviving pair set — never the corpus.
    QueryDef(
      "d06_embedding_neardup_docs",
      (s, dir) => {
        import s.implicits._
        val emb = withQNorm(t(s, dir, "embeddings")).withColumn("bucket", bucketCol)
        val a = emb.select($"vec_id".as("i"), $"q".as("qa"), $"n2".as("n2a"), $"bucket")
        val b = emb.select($"vec_id".as("j"), $"q".as("qb"), $"n2".as("n2b"),
          $"bucket".as("bucket_b"))
        val pairs = a.join(b, $"bucket" === $"bucket_b" && $"i" < $"j")
          .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
          .filter($"cos" >= 0.35)
          .select($"i", $"j", $"cos")
        val docs = t(s, dir, "documents")
        pairs
          .join(docs.select($"doc_id".as("i"), $"source".as("source_i"), $"lang".as("lang_i")), "i")
          .join(docs.select($"doc_id".as("j"), $"source".as("source_j"), $"lang".as("lang_j")), "j")
          .select($"i", $"j", $"cos",
            ($"source_i" === $"source_j").as("same_source"),
            ($"lang_i" === $"lang_j").as("same_lang"))
          .orderBy($"i", $"j")
      },
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $SIGNS_SQL,
        $QNORM_SQL,
        projs AS (
          SELECT vec_id, p, CAST(SUM(q[d+1]*w) AS BIGINT) AS proj
          FROM qv CROSS JOIN signs GROUP BY vec_id, p),
        buckets AS (
          SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
          FROM projs GROUP BY vec_id),
        cands AS (
          SELECT a.vec_id AS i, b.vec_id AS j
          FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        dots AS (
          SELECT c.i, c.j, CAST(SUM(qa.q[dims.i+1]*qb.q[dims.i+1]) AS BIGINT) AS dot
          FROM cands c JOIN qv qa ON qa.vec_id = c.i JOIN qv qb ON qb.vec_id = c.j
          CROSS JOIN dims GROUP BY c.i, c.j)
        SELECT d.i, d.j,
               CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) AS cos,
               di.source = dj.source AS same_source,
               di.lang = dj.lang AS same_lang
        FROM dots d JOIN norms na ON na.vec_id = d.i JOIN norms nb ON nb.vec_id = d.j
             JOIN documents di ON di.doc_id = d.i JOIN documents dj ON dj.doc_id = d.j
        WHERE CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) >= 0.35
        ORDER BY d.i, d.j"""),
    ),

    // ---- s03: kNN-label classification (majority vote of top-5) ----
    QueryDef(
      "s03_knn_classify",
      (s, dir) => {
        import s.implicits._
        val emb = withQNorm(t(s, dir, "embeddings"))
        val q = emb.filter($"vec_id" < 20)
          .select($"vec_id".as("qid"), $"q".as("qa"), $"n2".as("n2a"))
        val c = emb.filter($"vec_id" >= 20)
          .select($"vec_id".as("cid"), $"q".as("qb"), $"n2".as("n2b"),
            $"label".as("clabel"))
        val wTop = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
        val top5 = c.join(broadcast(q))
          .withColumn("cos", cosine(dotInt("qa", "qb"), $"n2a", $"n2b"))
          .withColumn("rn", row_number().over(wTop))
          .filter($"rn" <= 5)
        val wVote = Window.partitionBy($"qid").orderBy($"votes".desc, $"clabel")
        top5.groupBy($"qid", $"clabel").agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(wVote))
          .filter($"vr" === 1)
          .select($"qid", $"clabel".as("pred_label"), $"votes")
          .orderBy($"qid")
      },
      Some(s"""
        WITH dims AS (SELECT unnest(range(64)) AS i),
        $QNORM_SQL,
        dots AS (
          SELECT a.vec_id AS qid, b.vec_id AS cid, b.label AS clabel,
                 CAST(SUM(a.q[i+1]*b.q[i+1]) AS BIGINT) AS dot
          FROM qv a JOIN qv b ON a.vec_id < 20 AND b.vec_id >= 20
          CROSS JOIN dims GROUP BY a.vec_id, b.vec_id, b.label),
        top5 AS (
          SELECT qid, cid, clabel FROM (
            SELECT qid, cid, clabel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                     CAST(dot AS DOUBLE)/sqrt(CAST(na.n2 AS DOUBLE)*CAST(nb.n2 AS DOUBLE)) DESC,
                     cid) AS rn
            FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = cid) x
          WHERE rn <= 5),
        votes AS (SELECT qid, clabel, COUNT(*) AS votes FROM top5 GROUP BY qid, clabel)
        SELECT qid, clabel AS pred_label, votes FROM (
          SELECT qid, clabel, votes,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, clabel) AS vr
          FROM votes) v
        WHERE vr = 1 ORDER BY qid"""),
    ),

    // ---- s04: per-label centroids (posexplode + exact integer mean) ----
    QueryDef(
      "s04_label_centroids",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .withColumn("q", quantized($"embedding"))
          .select($"label", posexplode($"q").as(Seq("dim", "v")))
          .groupBy($"label", $"dim")
          .agg((sum($"v").cast("double") / QUANT.toDouble / count(lit(1))).as("centroid"),
            count(lit(1)).as("n"))
          .orderBy($"label", $"dim")
      },
      Some(s"""
        WITH $QNORM_SQL
        SELECT label, i AS dim,
               CAST(CAST(SUM(q[i+1]) AS BIGINT) AS DOUBLE)/$QUANT.0/COUNT(*) AS centroid,
               COUNT(*) AS n
        FROM qv CROSS JOIN (SELECT unnest(range(64)) AS i) dims
        GROUP BY label, i ORDER BY label, dim"""),
    ),
  )
}
