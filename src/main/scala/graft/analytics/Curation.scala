package graft.analytics

import graft.GraftSession
import graft.GraftSession.MaterializeOps
import graft.{QueryDef, Tables}
import graft.sqlx.PersistOnceOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Connected-component labels `(node, lab)` of the d05 SimHash near-dup
    * graph, lab = component minimum; only edge-touched docs appear
    * (consumers label singletons as themselves via a left join). ONE
    * contraction (the p03 iterated per-partition union-find, see the p03
    * comment for the scale argument) cached per (session, dir) and shared
    * by p03 (cluster report), p11 (leakage-safe split) and d18 (canonical
    * selection) — the cluster structure is computed once per run, the way
    * a production pipeline materializes components once and fans out. */
  private val labelsCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), DataFrame]
  private[graft] def dupClusterLabels(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    labelsCache.getOrElseUpdate((s, dir),
      contractComponents(s, Dedup.simhashPairs(s, dir).select("i", "j")))

  /** Symmetric near-dup adjacency `(src, dst)` (both orientations of the
    * d05 pair set), hash-partitioned by `src` and persisted per
    * (session, dir) — the SAME shared-index contract as
    * [[dupClusterLabels]]: p15 (PageRank), p16 (BFS) and p21
    * (transitivity) all walk this edge list, and each previously
    * re-symmetrized + re-shuffled + re-materialized it per call. The
    * `src` partitioning is the one every consumer's first join/groupBy
    * keys on, so it is established once for the session. */
  private val symmEdgesCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), DataFrame]
  private[graft] def symmEdges(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    symmEdgesCache.getOrElseUpdate((s, dir), {
      val pairs = Dedup.simhashPairs(s, dir).select(col("i"), col("j"))
      // materialized (LogicalRDD), NOT persist: p15/p16 nest this frame
      // inside diameter-many iterated joins, and a lazy persisted frame
      // embeds the whole simhash lineage as an InMemoryRelation subtree
      // at EVERY leaf — measured 2s -> 9s on p15 from pure planning/AQE
      // work over the exploded tree. The checkpoint seam keeps the plan
      // leaf compact and preserves the src hash-partitioning.
      pairs.select(col("i").as("src"), col("j").as("dst"))
        .unionAll(pairs.select(col("j").as("src"), col("i").as("dst")))
        .repartition(col("src"))
        .materialized
    })

  /** Per-node degree `(src, deg)` of [[symmEdges]], persisted — p15's
    * rank seed/denominator and p21's neighbor-degree orientation are the
    * same aggregate. Shuffle-free on top of the edge cache (grouped on
    * its partitioning key). */
  private val symmDegCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), DataFrame]
  private[analytics] def symmDeg(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    symmDegCache.getOrElseUpdate((s, dir),
      symmEdges(s, dir).groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .materialized) // compact LogicalRDD leaf — see symmEdges note

  /** Canonical-selection frames shared by d18 (the per-doc keep report)
    * and p18 (the pipeline's canonical stage): per-cluster
    * (cluster_size, max n_chars) and the canonical winner per cluster
    * (max chars, ties to smallest doc_id). Both are CLUSTER-sized,
    * materialized once per (session, dir) — each consumer previously
    * re-ran the corpus-wide label join plus two aggregates per
    * invocation. Same shared-index contract as [[dupClusterLabels]]. */
  private val canonCache =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), (DataFrame, DataFrame)]
  private[graft] def canonFrames(
      s: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) =
    canonCache.getOrElseUpdate((s, dir), {
      val labels = dupClusterLabels(s, dir)
      val lab = Tables.t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .join(labels, col("doc_id") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("lab"), col("doc_id")).as("cluster_rep"), col("n_chars"))
      val per = lab.groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("cluster_size"), max(col("n_chars")).as("mx"))
        .materialized
      val canon = lab.join(per, "cluster_rep")
        .filter(col("n_chars") === col("mx"))
        .groupBy(col("cluster_rep")).agg(min(col("doc_id")).as("canonical_id"))
        .materialized
      (per, canon)
    })

  /** The iterated per-partition union-find contraction over an arbitrary
    * `(i, j)` edge set — factored so other edge graphs (m10's cross-modal
    * union, streaming.IncrementalComponents' per-batch delta graph) run
    * the same machinery the SimHash labels use. */
  private[graft] def contractComponents(
      s: org.apache.spark.sql.SparkSession, pairs: DataFrame): DataFrame = {
      import s.implicits._
      // Per-pass action budget (r18): the r17 cadence ran THREE actions
      // per pass — labels materialize, active materialize, active.isEmpty
      // — and computed the per-pass root map TWICE (lazily, inside both
      // its consumers). Now each pass runs TWO jobs: the root map
      // materializes once (shared by both consumers), and the contracted
      // edge set materializes FUSED with its row count
      // (GraftSession.materializeCounted — the count doubles as the loop
      // condition, so the separate isEmpty probe is gone). The label
      // relabeling stays lazy: a depth-many coalesce-join fold over
      // LogicalRDD leaves (depth = contraction passes, 2-4 in practice),
      // collapsed by the single final materialize.
      var (active, activeN) = GraftSession.materializeCounted(pairs
        .select(least($"i", $"j").as("src"), greatest($"i", $"j").as("dst")))
      var labels: DataFrame = active.select($"src".as("node"))
        .union(active.select($"dst"))
        .distinct()
        .withColumn("lab", $"node")
      while (activeN > 0) {
        // union-find inside each partition: node -> min reachable root
        // THERE; a node split across partitions reconciles via min()
        val local = active.as[(Long, Long)].mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x // path compression
            while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          it.foreach { case (a, b) =>
            if (!parent.contains(a)) parent(a) = a
            if (!parent.contains(b)) parent(b) = b
            val ra = find(a); val rb = find(b)
            if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
          }
          val ks = parent.keys.toArray // materialize before compressing mutates
          ks.iterator.map(n => (n, find(n)))
        }.toDF("node", "root")
          .groupBy($"node").agg(min($"root").as("root"))
          .materialized // one job; shared by the relabel fold + contraction
        // relabel the accumulated labels through this pass's roots (lazy —
        // folded over LogicalRDD leaves, see the cadence note above)
        labels = labels.as("l")
          .join(local.as("m"), $"l.lab" === $"m.node", "left")
          .select($"l.node".as("node"), coalesce($"m.root", $"l.lab").as("lab"))
        // contract the edge list; same-root edges vanish as self-loops
        val (nextActive, nextN) = GraftSession.materializeCounted(active.as("e")
          .join(local.as("a"), $"e.src" === $"a.node", "left")
          .join(local.as("b"), $"e.dst" === $"b.node", "left")
          .select(coalesce($"a.root", $"e.src").as("u"), coalesce($"b.root", $"e.dst").as("v"))
          .filter($"u" =!= $"v")
          .select(least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
          .distinct())
        active = nextActive
        activeN = nextN
      }
      labels.materialized
  }

  /** Oracle twin of [[dupClusterLabels]]: CTE tail (edges/reach/labels)
    * to splice into a `WITH RECURSIVE` whose scope binds `pairs` —
    * `labels` is (node, rep). Shared by the p03/p11/d18 oracles. */
  private[analytics] val CLUSTER_LABELS_SQL = """
        edges AS (SELECT i, j FROM pairs UNION ALL SELECT j, i FROM pairs),
        reach(node, lab) AS (
          SELECT i, i FROM edges
          UNION
          SELECT e.j, r.lab FROM reach r JOIN edges e ON e.i = r.node
          WHERE r.lab < e.j),
        labels AS (SELECT node, MIN(lab) AS rep FROM reach GROUP BY node)"""

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
          .withColumn("bucket", Sampling.pctBucket($"doc_id"))
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

    // ---- p03: duplicate-cluster formation (connected components) ----
    // Near-dup PAIRS (d05) are not what a curation pipeline acts on — it
    // needs CLUSTERS, so it can keep one representative per component and
    // drop the rest. Components via ITERATED LOCAL CONTRACTION: each pass
    // runs union-find (min-root, path-compressed) inside every partition
    // — the one place `mapPartitions` is the honest tool: per-partition
    // imperative state with no relational equivalent — then relabels the
    // edge list through the discovered roots and drops the (vast majority
    // of) edges that collapsed into self-loops. Only edges CROSSING
    // partition-local components survive a pass, so passes ≈
    // log_P(components) — near-dup graphs are dense near-cliques (d05 at
    // sf0.1: 332k edges over 2.6k nodes), and a clique collapses the
    // moment any partition sees its edges: measured 8 label-propagation
    // rounds → 2 contraction passes (7.6s → ~2.5s). This is the published
    // two-phase CC shape (Kiveris et al., "Connected Components in
    // MapReduce and Beyond"): per-pass traffic is O(surviving edges),
    // per-partition memory is O(nodes in partition), and at 1000-executor
    // scale a 10^9-pair graph contracts in the same 2-4 passes — with
    // spark.graft.checkpointDir set, GraftSession.materialize swaps the
    // executor-local blocks for reliable checkpoint storage. The
    // driver sees only the surviving-edge count of a checkpointed frame.
    QueryDef(
      "p03_dup_clusters",
      (s, dir) => {
        import s.implicits._
        dupClusterLabels(s, dir)
          .groupBy($"lab".as("cluster_rep"))
          .agg(count(lit(1)).as("size"), max($"node").as("max_doc"))
          .orderBy($"cluster_rep")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        ${CLUSTER_LABELS_SQL}
        SELECT rep AS cluster_rep, COUNT(*) AS size, MAX(node) AS max_doc
        FROM labels GROUP BY rep ORDER BY rep"""),
    ),

    // ---- p04: sequence packing for training windows ----
    // Assign documents to fixed-token-budget packs (context windows) by
    // cumulative token offset within a source stream — the deterministic
    // streaming-packing rule (a doc goes to the pack its start offset
    // falls in). One window shuffle, partitioned by source; at 100 TB the
    // window key becomes (source, shard) so no single source serializes
    // into one partition — the rule itself is unchanged.
    QueryDef(
      "p04_sequence_packing",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        t(s, dir, "documents")
          .withColumn("n",
            size(regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).cast("long"))
          .withColumn("pack", floor((sum($"n").over(w) - $"n") / 256L))
          .groupBy($"source", $"pack")
          .agg(count(lit(1)).as("docs"), sum($"n").as("tokens"))
          .orderBy($"source", $"pack")
      },
      Some(s"""
        WITH n AS (
          SELECT doc_id, source,
                 CAST(len($TOKS_SQL) AS BIGINT) AS n
          FROM documents),
        o AS (
          SELECT source, n,
                 CAST((SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n) // 256 AS BIGINT) AS pack
          FROM n)
        SELECT source, pack, COUNT(*) AS docs, CAST(SUM(n) AS BIGINT) AS tokens
        FROM o GROUP BY source, pack ORDER BY source, pack"""),
    ),

    // ---- p05: vocabulary build + per-source OOV rate ----
    // The tokenizer-prep pass: global top-K token vocabulary (count desc,
    // token asc — fully deterministic at the cutoff), then each source's
    // out-of-vocabulary token rate against it. Two aggregate shuffles plus
    // a broadcast of the (tiny, top-K) vocab against the token stream —
    // the corpus never self-joins and the vocab side is K rows regardless
    // of corpus size, so the shape is identical at 100 TB.
    QueryDef(
      "p05_vocab_oov",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"source",
            explode(regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).as("tok"))
        val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
          .orderBy($"c".desc, $"tok").limit(16).select($"tok", lit(1).as("iv"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy($"source")
          .agg(
            count(lit(1)).as("total_tokens"),
            sum(when($"iv".isNull, 1L).otherwise(0L)).as("oov_tokens"))
          .withColumn("oov_rate", $"oov_tokens".cast("double") / $"total_tokens")
          .orderBy($"source")
      },
      Some(s"""
        WITH tok AS (
          SELECT source, unnest($TOKS_SQL) AS tok FROM documents),
        vocab AS (
          SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok)
          ORDER BY c DESC, tok LIMIT 16),
        j AS (
          SELECT t.source, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM tok t LEFT JOIN vocab v ON v.tok = t.tok)
        SELECT source, COUNT(*) AS total_tokens,
               CAST(SUM(oov) AS BIGINT) AS oov_tokens,
               CAST(SUM(oov) AS DOUBLE)/COUNT(*) AS oov_rate
        FROM j GROUP BY source ORDER BY source"""),
    ),

    // ---- p06: temperature-scaled mixture sampling (the multilingual ----
    // ---- / multi-source training-mix operator)                      ----
    // Proportional sampling lets the dominant source drown the tail;
    // uniform over-trains tiny sources. The standard fix (XLM-style
    // exponentiated smoothing) samples source s with p_s ∝ share_s^τ.
    // τ = 0.5 here, so the exponent is sqrt — correctly rounded per IEEE
    // in both engines, unlike pow(x, 0.7) whose libm results can differ
    // by an ulp. The normalizing sum runs over quantized BIGINT weights
    // (round(sqrt·1e9)) because a float sum's order is engine-dependent;
    // membership is then the p02 rule — a doc samples iff its md5 bucket
    // clears the per-source cut — so the mix is reproducible run-over-run
    // with no RNG state. Everything before the per-doc membership test is
    // a 10-row aggregate; the membership pass is a broadcast join + scan.
    QueryDef(
      "p06_temperature_mix",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val B = 200L // target sampled docs per epoch
        val docs = t(s, dir, "documents")
        val all = Window.partitionBy()
        val mix = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
          .withColumn("share", $"n_docs".cast("double") / sum($"n_docs").over(all))
          .withColumn("w_int", round(sqrt($"share") * 1e9).cast("long"))
          .withColumn("p", $"w_int".cast("double") / sum($"w_int").over(all))
          .withColumn("rate", least(lit(1.0), lit(B.toDouble) * $"p" / $"n_docs"))
          .withColumn("cut", floor($"rate" * (1L << 24)).cast("long"))
        docs
          .withColumn("bucket",
            conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10).cast("long"))
          .join(broadcast(mix), "source")
          .groupBy($"source")
          .agg(
            max($"n_docs").as("n_docs"),
            max($"p").as("p"),
            max($"rate").as("rate"),
            sum(when($"bucket" < $"cut", 1L).otherwise(0L)).as("sampled"))
          .withColumn("realized_frac", $"sampled".cast("double") / $"n_docs")
          .select($"source", $"n_docs", $"p", $"rate", $"sampled", $"realized_frac")
          .orderBy($"source")
      },
      Some("""
        WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        w AS (
          SELECT source, n_docs,
                 CAST(round(sqrt(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) * 1e9) AS BIGINT) AS w_int
          FROM per),
        mix AS (
          SELECT source, n_docs,
                 CAST(w_int AS DOUBLE) / SUM(w_int) OVER () AS p,
                 least(1.0, 200.0 * (CAST(w_int AS DOUBLE) / SUM(w_int) OVER ()) / n_docs) AS rate
          FROM w),
        mixc AS (
          SELECT source, n_docs, p, rate,
                 CAST(floor(rate * 16777216) AS BIGINT) AS cut FROM mix),
        b AS (
          SELECT d.source, m.n_docs, m.p, m.rate, m.cut,
                 CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT) AS bucket
          FROM documents d JOIN mixc m USING (source))
        SELECT source, MAX(n_docs) AS n_docs, MAX(p) AS p, MAX(rate) AS rate,
               CAST(SUM(CASE WHEN bucket < cut THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
               CAST(SUM(CASE WHEN bucket < cut THEN 1 ELSE 0 END) AS DOUBLE)/MAX(n_docs) AS realized_frac
        FROM b GROUP BY source ORDER BY source"""),
    ),

    // ---- p07: scalable contiguous global ID assignment ----
    // Every training run wants dense, stable sample ids (shard:offset
    // addressing, resumable iteration), but the naive
    // row_number() OVER (ORDER BY doc_id) is a single-partition window —
    // the whole corpus serializes through one task. The scalable shape is
    // the two-pass zipWithIndex pattern: range-repartition + sort within
    // partitions (a distributed sort, each partition a doc_id range),
    // count per partition, prefix-sum the counts (P rows on the driver —
    // partition COUNTS, not data), then assign offset+i per partition in
    // one narrow pass. Deterministic: range partitions are ordered and
    // rows are sorted within each, so id = global rank by doc_id.
    QueryDef(
      "p07_stable_ids",
      (s, dir) => {
        import s.implicits._
        val sorted = t(s, dir, "documents").select($"doc_id")
          .repartitionByRange(8, $"doc_id")
          .sortWithinPartitions($"doc_id")
        val ids = sorted.rdd
          .zipWithIndex // two-pass: per-partition counts job, then offset+i
          .map { case (r, i) => (r.getLong(0), i) }
        s.createDataFrame(ids).toDF("doc_id", "stable_id")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS stable_id
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- p08: deterministic stratified train/val/test split ----
    // The split must be (a) reproducible with no RNG state, (b) stable
    // under corpus growth (a doc never migrates between splits when new
    // docs arrive), and (c) auditable per stratum. Hash-bucket membership
    // gives all three: split = f(md5("split:" <> doc_id)), so membership
    // is a pure function of the id. 80/10/10 on the first 24 bits. The
    // whole operator is one codegen'd scan + a tiny (source × split)
    // aggregate — at 100 TB nothing shuffles but the counts.
    QueryDef(
      "p08_train_val_split",
      (s, dir) => {
        import s.implicits._
        val cutTrain = (0.8 * (1L << 24)).toLong
        val cutVal = (0.9 * (1L << 24)).toLong
        t(s, dir, "documents")
          .withColumn("bucket",
            conv(substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
              .cast("long"))
          .withColumn("split",
            when($"bucket" < cutTrain, "train")
              .when($"bucket" < cutVal, "val")
              .otherwise("test"))
          .groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
          .orderBy($"source", $"split")
      },
      Some("""
        WITH b AS (
          SELECT source, n_chars,
                 CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) AS bucket
          FROM documents),
        sp AS (
          SELECT source, n_chars,
                 CASE WHEN bucket < 13421772 THEN 'train'
                      WHEN bucket < 15099494 THEN 'val'
                      ELSE 'test' END AS split
          FROM b)
        SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM sp GROUP BY source, split ORDER BY source, split"""),
    ),

    // ---- p09: novelty-weighted sampling (dedup-aware training mix) ----
    // The composition the d13 signal exists for: rank documents by
    // first-owner novelty into deciles (ties broken by doc_id — fully
    // deterministic), then sample each decile at a rate proportional to
    // its novelty (decile d keeps d/10 of its docs) via the p02/p06
    // md5-bucket rule. Near-copies (low novelty) are downsampled hard,
    // fresh content survives — reproducible run-over-run with no RNG
    // state. The novelty pass is two linear aggregates on the persisted
    // shingle index; the decile split is one window over per-doc scores;
    // membership is a codegen'd scan.
    QueryDef(
      "p09_novelty_weighted_sample",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val toks = Dedup.shingleIndex(s, dir) // shared persisted inverted index
        val owner = toks.groupBy($"s").agg(min($"doc_id").as("first_doc"))
        val novelty = toks.join(owner, "s")
          .groupBy($"doc_id")
          .agg((sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("novelty"))
        // decile via the p07 two-pass rank (range repartition + in-partition
        // sort + zipWithIndex), NOT a global ntile window — the un-partitioned
        // window would funnel one row per corpus document through a single
        // task. The closed-form bucket from (rank, total) reproduces SQL
        // ntile exactly: the first n%10 buckets get ceil(n/10) rows.
        val sortedNov = novelty
          .repartitionByRange(8, $"novelty", $"doc_id")
          .sortWithinPartitions($"novelty", $"doc_id")
          // cache: count() and zipWithIndex would each re-run the novelty
          // aggregates + shuffle + sort from lineage
          .persistOnce()
        val n = sortedNov.count() // distributed agg; table stats at scale
        val (q10, rem) = (n / 10L, n % 10L)
        val ranked = s.createDataFrame(
          sortedNov.select($"doc_id", $"novelty").as[(Long, Double)].rdd
            .zipWithIndex.map { case ((d, nv), r) => (d, nv, r) })
          .toDF("doc_id", "novelty", "r")
        val big = q10 + 1L
        val deciled = ranked
          .withColumn("decile",
            when($"r" < lit(rem * big), expr(s"r DIV $big"))
              .otherwise(lit(rem) +
                expr(s"(r - ${rem * big}) DIV ${math.max(q10, 1L)}")) + 1L)
          // integer floor division, matching the oracle's `// 10` exactly
          // (a double `/` would put fractional cuts one ulp above the
          // integer bucket boundary)
          .withColumn("cut", expr(s"(decile * ${1L << 24}) DIV 10"))
          .withColumn("bucket",
            conv(substring(md5(concat(lit("nw:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
              .cast("long"))
          .withColumn("sampled", ($"bucket" < $"cut").cast("long"))
        deciled.groupBy($"decile")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"sampled").as("n_sampled"),
            min($"novelty").as("novelty_lo"),
            max($"novelty").as("novelty_hi"))
          .withColumn("realized_rate", $"n_sampled".cast("double") / $"n_docs")
          .orderBy($"decile")
      },
      Some(s"""
        WITH sh AS (SELECT doc_id, unnest(${Dedup.SHINGLES_SQL}) AS s FROM documents),
        owner AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
        nov AS (
          SELECT sh.doc_id,
                 CAST(SUM(CASE WHEN o.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS novelty
          FROM sh JOIN owner o USING (s) GROUP BY sh.doc_id),
        dec AS (
          SELECT doc_id, novelty,
                 CAST(ntile(10) OVER (ORDER BY novelty, doc_id) AS BIGINT) AS decile
          FROM nov),
        mem AS (
          SELECT decile, novelty,
                 CASE WHEN CAST('0x' || substr(md5('nw:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                      < (decile * 16777216) // 10 THEN 1 ELSE 0 END AS sampled
          FROM dec)
        SELECT decile, COUNT(*) AS n_docs,
               CAST(SUM(sampled) AS BIGINT) AS n_sampled,
               MIN(novelty) AS novelty_lo, MAX(novelty) AS novelty_hi,
               CAST(SUM(sampled) AS DOUBLE)/COUNT(*) AS realized_rate
        FROM mem GROUP BY decile ORDER BY decile"""),
    ),

    // ---- p10: split decontamination audit ----
    // Composes p08's deterministic hash split with d07's shingle-overlap
    // machinery: a train doc is "leaky" if it shares >= 3 distinct 3-gram
    // shingles with ANY document of the val split — the cross-split
    // contamination every eval pipeline must audit before trusting its
    // numbers (a val set that leaks into train inflates every metric).
    // Dataflow: the shared persisted shingle index is scanned twice (train
    // side / val side of the split predicate), joined once on the shingle
    // key, one per-doc agg, one per-source report agg. Unlike d07 the val
    // side is a constant FRACTION of the corpus, not a tiny benchmark —
    // so this is a shuffle equi-join on the shingle (AQE skew-split), NOT
    // a broadcast; the report stays linear in corpus size at any scale.
    QueryDef(
      "p10_split_decontam",
      (s, dir) => {
        import s.implicits._
        val cutTrain = (0.8 * (1L << 24)).toLong
        val cutVal = (0.9 * (1L << 24)).toLong
        val split = t(s, dir, "documents")
          .withColumn("bucket",
            conv(substring(md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
              .cast("long"))
          .withColumn("split",
            when($"bucket" < cutTrain, "train")
              .when($"bucket" < cutVal, "val")
              .otherwise("test"))
          .select($"doc_id", $"source", $"split")
        // the split is a PURE FUNCTION of doc_id (r18): evaluate the
        // bucket expression directly on the shingle index rows instead of
        // joining the doc-level split frame into BOTH sides of the
        // overlap join — two corpus-scale joins become two codegen'd
        // filters over the cached index
        val bucket = conv(substring(
          md5(concat(lit("split:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
          .cast("long")
        val shB = Dedup.shingleIndex(s, dir).withColumn("bucket", bucket)
        val valSh = shB.filter($"bucket" >= cutTrain && $"bucket" < cutVal)
          .select($"s").distinct()
        val leaky = shB.filter($"bucket" < cutTrain)
          .join(valSh, "s")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("overlap")) // shingles distinct per doc
          .filter($"overlap" >= 3)
          .select($"doc_id", lit(1L).as("is_leaky"))
        split.filter($"split" === "train")
          .join(leaky, Seq("doc_id"), "left")
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_train"),
            sum(coalesce($"is_leaky", lit(0L))).as("n_leaky"))
          .withColumn("leak_ratio", $"n_leaky".cast("double") / $"n_train")
          .orderBy($"source")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, source,
                 CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) AS bucket
          FROM documents),
        sp AS (
          SELECT doc_id, source,
                 CASE WHEN bucket < 13421772 THEN 'train'
                      WHEN bucket < 15099494 THEN 'val'
                      ELSE 'test' END AS split
          FROM b),
        sh AS (SELECT doc_id, unnest(${Dedup.SHINGLES_SQL}) AS s FROM documents),
        vs AS (SELECT DISTINCT s FROM sh JOIN sp USING (doc_id) WHERE sp.split = 'val'),
        leaky AS (
          SELECT sh.doc_id FROM sh
          JOIN sp USING (doc_id) JOIN vs USING (s)
          WHERE sp.split = 'train'
          GROUP BY sh.doc_id HAVING COUNT(*) >= 3)
        SELECT sp.source, COUNT(*) AS n_train,
               CAST(SUM(CASE WHEN leaky.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky,
               CAST(SUM(CASE WHEN leaky.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS leak_ratio
        FROM sp LEFT JOIN leaky ON leaky.doc_id = sp.doc_id
        WHERE sp.split = 'train'
        GROUP BY sp.source ORDER BY sp.source"""),
    ),

    // ---- p11: leakage-safe train/val/test split ----
    // The FIX for what p10 audits: a per-doc hash split puts the two halves
    // of a near-dup pair on opposite sides of the train/eval boundary, and
    // the eval numbers inflate. Splitting by the doc's near-dup CLUSTER
    // representative (p03's components over the d05 SimHash graph;
    // singletons represent themselves) makes straddling impossible by
    // construction — every member of a component hashes the same rep into
    // the same md5 bucket. Output additionally carries the naive per-doc
    // assignment and a `moved` flag, so SUM(moved) is the measured leakage
    // the cluster rule prevented. 100 TB: the cluster labels are the
    // shared p03 contraction (computed once per run), the split itself is
    // one left join + scan-speed hash bucketing — no new shuffle beyond
    // the label join.
    QueryDef(
      "p11_leakage_safe_split",
      (s, dir) => {
        import s.implicits._
        val labels = dupClusterLabels(s, dir)
        t(s, dir, "documents").select($"doc_id")
          .join(labels, $"doc_id" === $"node", "left")
          .select($"doc_id", coalesce($"lab", $"doc_id").as("cluster_rep"))
          .withColumn("bucket", Sampling.pctBucket($"cluster_rep"))
          .withColumn("naive_bucket", Sampling.pctBucket($"doc_id"))
          .select(
            $"doc_id", $"cluster_rep",
            when($"bucket" < 80, "train").when($"bucket" < 90, "val")
              .otherwise("test").as("split"),
            (when($"bucket" < 80, "train").when($"bucket" < 90, "val")
              .otherwise("test") =!=
             when($"naive_bucket" < 80, "train").when($"naive_bucket" < 90, "val")
              .otherwise("test")).as("moved"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        ${CLUSTER_LABELS_SQL},
        lab AS (
          SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS cluster_rep
          FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
        b AS (
          SELECT doc_id, cluster_rep,
                 ${Sampling.pctBucketSql("cluster_rep")} AS bucket,
                 ${Sampling.pctBucketSql("doc_id")} AS naive_bucket
          FROM lab)
        SELECT doc_id, cluster_rep,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
               (CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val' ELSE 'test' END) <>
               (CASE WHEN naive_bucket < 80 THEN 'train'
                     WHEN naive_bucket < 90 THEN 'val' ELSE 'test' END) AS moved
        FROM b ORDER BY doc_id"""),
    ),

    // ---- p12: per-source quota cap (domain capping) ----
    // The anti-dominance gate a web-scale corpus runs before mixing: no
    // source (domain) may contribute more than QUOTA documents, and the
    // kept ones are chosen deterministically — fullest first (n_chars
    // DESC), doc_id tie-break. Runs on the custom TopKPerKey plan, not a
    // window: WindowExec would shuffle and fully SORT every document of a
    // source into one partition — at 100 TB a hot domain IS the skew.
    // TopKPerKey keeps a QUOTA-bounded heap per source per input
    // partition, shuffles only the ≤ partitions×sources×QUOTA survivors,
    // and never sorts a full partition (TopKBench: 2.03× the window form).
    QueryDef(
      "p12_source_quota_cap",
      (s, dir) => {
        import s.implicits._
        graft.plans.TopK.perKey(
          t(s, dir, "documents").select($"source", $"doc_id", $"n_chars"),
          Seq("source"),
          Seq("n_chars" -> false, "doc_id" -> true), 8)
          .select($"source", $"doc_id", $"n_chars")
          .orderBy($"source", $"n_chars".desc, $"doc_id")
      },
      Some("""
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) x
        WHERE rn <= 8
        ORDER BY source, n_chars DESC, doc_id"""),
    ),

    // ---- p13: UniMax-style language token-budget allocation ----
    // Waterfilling a total token budget (60% of corpus supply here) across
    // languages: low-resource languages contribute their FULL supply, the
    // surplus redistributes uniformly among the rest, and the cap is the
    // point where remaining-budget / remaining-languages crosses the
    // supply curve — the UniMax alternative to temperature sampling (p06)
    // that never over-epochs a small language. Closed form, no iteration:
    // sort languages by supply ascending; the first language whose supply
    // exceeds the budget-share of the languages at-or-after it is the
    // first CAPPED one; everything before keeps its supply, everything
    // after gets the integer cap. All arithmetic exact BIGINT (one
    // integer div), so both engines agree bit-for-bit. Scale: the only
    // corpus-sized work is the per-language token sum (one scan-speed
    // map-side agg); the waterfilling itself runs on #languages rows —
    // its unpartitioned windows are over a provably bounded frame.
    QueryDef(
      "p13_unimax_budget",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sup = t(s, dir, "documents")
          .withColumn("n",
            size(regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).cast("long"))
          .groupBy($"lang").agg(sum($"n").as("supply"))
        // 80% of supply: on this corpus that caps ONLY the high-resource
        // language and leaves the rest at full supply — both branches of
        // the waterfilling live in the gate (60% would cap everything)
        val budget = sup.agg((sum($"supply") * 8L).divide(lit(10L)).cast("long").as("b"))
        val wOrd = Window.orderBy($"supply", $"lang")
        val ord = sup.crossJoin(broadcast(budget))
          .withColumn("r", row_number().over(wOrd))
          .withColumn("ps", sum($"supply").over(
            wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("k", count(lit(1)).over(
            Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          // cap candidate at this row: remaining budget shared by r..k
          .withColumn("cap_row", expr("(b - ps + supply) div (k - r + 1)"))
        // the shared cap is cap_row AT the first capped row specifically —
        // NOT min(cap_row) over capped rows, which can undershoot when a
        // later row's remaining-budget share dips below the true cap
        val fc = ord.agg(min(when($"supply" > $"cap_row", $"r")).as("fc"))
        val cap = ord.crossJoin(broadcast(fc))
          .agg(min($"fc").as("fc"), min(when($"r" === $"fc", $"cap_row")).as("cap"))
        ord.crossJoin(broadcast(cap))
          .select($"lang", $"supply",
            when($"fc".isNull || $"r" < $"fc", $"supply").otherwise($"cap").as("alloc"),
            ($"fc".isNotNull && $"r" >= $"fc").as("capped"))
          .orderBy($"lang")
      },
      Some(s"""
        WITH sup AS (
          SELECT lang, CAST(SUM(len($TOKS_SQL)) AS BIGINT) AS supply
          FROM documents GROUP BY lang),
        b AS (SELECT CAST(SUM(supply) AS BIGINT) * 8 // 10 AS b FROM sup),
        ord AS (
          SELECT lang, supply, b,
                 ROW_NUMBER() OVER (ORDER BY supply, lang) AS r,
                 CAST(SUM(supply) OVER (ORDER BY supply, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ps,
                 COUNT(*) OVER () AS k
          FROM sup CROSS JOIN b),
        c AS (SELECT *, (b - ps + supply) // (k - r + 1) AS cap_row FROM ord),
        fc AS (SELECT MIN(CASE WHEN supply > cap_row THEN r END) AS fc FROM c),
        cap AS (
          SELECT MIN(fc.fc) AS fc,
                 MIN(CASE WHEN c.r = fc.fc THEN c.cap_row END) AS cap
          FROM c CROSS JOIN fc)
        SELECT c.lang, c.supply,
               CASE WHEN cap.fc IS NULL OR c.r < cap.fc
                    THEN c.supply ELSE cap.cap END AS alloc,
               (cap.fc IS NOT NULL AND c.r >= cap.fc) AS capped
        FROM c CROSS JOIN cap
        ORDER BY c.lang"""),
    ),

    // ---- p14: DSIR-style importance-resampled data selection ----
    // Data Selection via Importance Resampling (Xie et al., 2023): score
    // raw-pool documents by how target-like their hashed n-gram
    // distribution is, then keep the top slice. The model is a log-ratio
    // table over D hashed-bigram buckets — log p̂_target(b) − log p̂_raw(b)
    // with add-one smoothing — and a document's importance weight is the
    // sum of its bigrams' log-ratios. Dataflow at 100 TB: two
    // vocab-linear aggregates build the D-row model (map-side combined),
    // the model BROADCASTS (it is 4096 rows regardless of corpus size),
    // and scoring is one scan + broadcast join + per-doc agg — the t12
    // classifier shape with a learned-from-data table instead of fixed
    // weights. The top-100 pick is TakeOrderedAndProject (distributed
    // top-k), never a global sort; the rank window runs on the 100-row
    // result. Numeric parity: the four log2 terms are quantized once, in
    // the MODEL (round ×10⁶ → BIGINT), so per-doc scoring is exact
    // integer arithmetic — ulp noise cannot reorder documents. Target
    // membership is the p08 md5-bucket rule under a "dsir:" salt (~10%),
    // and the target sample itself is excluded from the scored pool.
    QueryDef(
      "p14_dsir_selection",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.graft.ColumnBridge
        val D = 4096
        val cutTgt = (0.1 * (1L << 24)).toLong
        def ngrams2(c: org.apache.spark.sql.Column) =
          ColumnBridge.column(graft.functions.WordNgrams(
            ColumnBridge.expression(c), 2, distinct = false))
        // token arrays come from the shared persisted tokenize (s15's
        // tokDocs cache) — the bigram index is consumed three times below
        // (target counts, raw counts, per-doc tf) and the regex tokenize
        // is the expensive part of each pass
        val docs = Similarity.tokDocs(s, dir)
          .withColumn("is_tgt",
            conv(substring(md5(concat(lit("dsir:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
              .cast("long") < cutTgt)
        // persisted: three consumers (target counts, raw counts, per-doc
        // tf) each re-ran the ngram explode + md5 bucketing otherwise;
        // narrow (long, bool, int) rows — cache-friendly
        val bt = docs
          .select($"doc_id", $"is_tgt", explode(ngrams2($"w")).as("g"))
          .withColumn("bucket",
            (conv(substring(md5($"g"), 1, 6), 16, 10).cast("long") % D).cast("int"))
          .select($"doc_id", $"is_tgt", $"bucket")
          .persistOnce()
        val pcnt = bt.filter($"is_tgt").groupBy($"bucket").agg(count(lit(1)).as("pn"))
        val qcnt = bt.groupBy($"bucket").agg(count(lit(1)).as("qn"))
        val tot = pcnt.agg(sum($"pn").as("pt")).crossJoin(qcnt.agg(sum($"qn").as("qt")))
        val model = s.range(D).select($"id".cast("int").as("bucket"))
          .join(pcnt, Seq("bucket"), "left")
          .join(qcnt, Seq("bucket"), "left")
          .crossJoin(tot)
          .select($"bucket",
            round((log2(coalesce($"pn", lit(0L)) + 1L) - log2($"pt" + D)
              - log2(coalesce($"qn", lit(0L)) + 1L) + log2($"qt" + D)) * 1e6)
              .cast("long").as("lr"))
        val tf = bt.filter(!$"is_tgt")
          .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("tf"))
        val top = tf.join(broadcast(model), "bucket")
          .groupBy($"doc_id")
          .agg(sum($"tf").as("n_grams"), sum($"tf" * $"lr").as("score_q"))
          .orderBy($"score_q".desc, $"doc_id")
          .limit(100)
        top.withColumn("rn",
            row_number().over(Window.orderBy($"score_q".desc, $"doc_id")))
          .select($"rn", $"doc_id", $"n_grams", $"score_q")
          .orderBy($"rn")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, $TOKS_SQL AS w FROM documents),
        grams AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
          FROM toks),
        tgt AS (
          SELECT doc_id FROM documents
          WHERE CAST('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                < 1677721),
        bt AS (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(g), 1, 6) AS BIGINT) % 4096 AS INT) AS bucket
          FROM grams),
        p AS (SELECT bucket, COUNT(*) AS pn FROM bt JOIN tgt USING (doc_id) GROUP BY bucket),
        q AS (SELECT bucket, COUNT(*) AS qn FROM bt GROUP BY bucket),
        tot AS (SELECT (SELECT COUNT(*) FROM bt JOIN tgt USING (doc_id)) AS pt,
                       (SELECT COUNT(*) FROM bt) AS qt),
        model AS (
          SELECT b.bucket,
                 CAST(round((log2(COALESCE(pn, 0) + 1) - log2(pt + 4096)
                             - log2(COALESCE(qn, 0) + 1) + log2(qt + 4096)) * 1000000)
                      AS BIGINT) AS lr
          FROM (SELECT CAST(unnest(range(4096)) AS INT) AS bucket) b
          LEFT JOIN p USING (bucket) LEFT JOIN q USING (bucket) CROSS JOIN tot),
        tf AS (
          SELECT doc_id, bucket, COUNT(*) AS tf FROM bt
          WHERE doc_id NOT IN (SELECT doc_id FROM tgt)
          GROUP BY doc_id, bucket),
        scored AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_grams,
                 CAST(SUM(tf * lr) AS BIGINT) AS score_q
          FROM tf JOIN model USING (bucket) GROUP BY doc_id),
        top AS (
          SELECT doc_id, n_grams, score_q FROM scored
          ORDER BY score_q DESC, doc_id LIMIT 100)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS INT) AS rn,
               doc_id, n_grams, score_q
        FROM top ORDER BY rn"""),
    ),

    // ---- p15: PageRank-style authority over the near-dup graph ----
    // Web-pipeline quality stacks use link-graph centrality as a
    // document-quality prior; the corpus-internal analogue ranks docs by
    // centrality in the SIMILARITY graph — a doc that many distinct docs
    // near-duplicate is template/boilerplate-like (high authority in the
    // dup graph), which downstream weighting wants to know about. Three
    // power-iteration steps (damping 0.85) over the d05 SimHash edge set,
    // entirely in exact integer arithmetic: ranks are ×10⁶-scaled BIGINTs
    // and every division is integral (DIV here, // in DuckDB — both
    // truncate on the positive values used), so both engines produce
    // bit-identical ranks with no float summation anywhere. Scale shape:
    // the edge list is the (sparse) near-dup pair set, persisted once via
    // GraftSession.materialize (the band-join build must not replay per
    // iteration); each step is contribution-map (narrow) → one shuffle on
    // the destination key → left join back to the node set — the
    // Pregel/GraphX dataflow written as three unrolled joins, never a
    // corpus×corpus product; the top-20 pick is TakeOrderedAndProject.
    // Every node in the edge graph has deg ≥ 1 by construction, so there
    // is no dangling-mass term.
    QueryDef(
      "p15_pagerank_authority",
      (s, dir) => {
        import s.implicits._
        val SCALE = 1000000L
        // shared session adjacency + degrees (see symmEdges): the edge
        // list arrives already src-partitioned and persisted, so each
        // power-iteration's edges⋈contrib join reuses that partitioning
        // and the per-call symmetrize+materialize jobs are gone
        val edges = symmEdges(s, dir)
        val deg = symmDeg(s, dir)
        var ranks = deg.select($"src".as("node"), $"deg", lit(SCALE).as("r"))
        for (_ <- 1 to 3) {
          val contrib = ranks.select($"node".as("src"), expr("r DIV deg").as("c"))
          val inbound = edges.join(contrib, "src")
            .groupBy($"dst").agg(sum($"c").as("inb"))
          ranks = deg.select($"src".as("node"), $"deg")
            .join(inbound.withColumnRenamed("dst", "node"), Seq("node"), "left")
            .withColumn("r",
              lit(15L * SCALE / 100) + expr("(85 * coalesce(inb, 0)) DIV 100"))
            .select($"node", $"deg", $"r")
        }
        ranks
          .select($"node".as("doc_id"), $"deg", $"r".as("rank_q"))
          .orderBy($"rank_q".desc, $"doc_id").limit(20)
      },
      Some(s"""
        WITH sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        edges AS (SELECT i AS src, j AS dst FROM pairs
                  UNION ALL SELECT j AS src, i AS dst FROM pairs),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
        c1 AS (SELECT node AS src, r // deg AS c FROM r0),
        i1 AS (SELECT dst, SUM(c) AS inb FROM edges JOIN c1 USING (src) GROUP BY dst),
        r1 AS (SELECT d.src AS node, d.deg,
                      CAST(150000 + (85 * COALESCE(i1.inb, 0)) // 100 AS BIGINT) AS r
               FROM deg d LEFT JOIN i1 ON i1.dst = d.src),
        c2 AS (SELECT node AS src, r // deg AS c FROM r1),
        i2 AS (SELECT dst, SUM(c) AS inb FROM edges JOIN c2 USING (src) GROUP BY dst),
        r2 AS (SELECT d.src AS node, d.deg,
                      CAST(150000 + (85 * COALESCE(i2.inb, 0)) // 100 AS BIGINT) AS r
               FROM deg d LEFT JOIN i2 ON i2.dst = d.src),
        c3 AS (SELECT node AS src, r // deg AS c FROM r2),
        i3 AS (SELECT dst, SUM(c) AS inb FROM edges JOIN c3 USING (src) GROUP BY dst),
        r3 AS (SELECT d.src AS node, d.deg,
                      CAST(150000 + (85 * COALESCE(i3.inb, 0)) // 100 AS BIGINT) AS r
               FROM deg d LEFT JOIN i3 ON i3.dst = d.src)
        SELECT node AS doc_id, deg, r AS rank_q
        FROM r3 ORDER BY rank_q DESC, doc_id LIMIT 20"""),
    ),

    // ---- p16: BFS hop distance from each cluster's representative ----
    // How far (in near-dup hops) each document sits from its cluster's
    // canonical representative — the graph-distance complement to d18's
    // canonical SELECTION and p15's authority. Transitive near-dup chains
    // (A~B~C where A!~C) are exactly the cases where hop distance grades
    // "how derived" a copy is; a curation pass can then keep hops<=1 and
    // drop the long tail of chained mutations.
    //
    // Dataflow: frontier-expansion BFS (the Pregel iteration written as
    // joins), co-partitioned per the round-8 scale audit (sf1 ratio was
    // 0.888, the fleet's worst — the edge list re-shuffled EVERY level):
    //  * the edge list is repartitioned by src ONCE and materialized, so
    //    each hop's frontier⋈edges join reuses that hash partitioning
    //    (the frontier side arrives hash(node)-partitioned from the
    //    previous level's min-agg; the materialize seam preserves the
    //    physical partitioning into the LogicalRDD) — the corpus-pair-sized
    //    side
    //    never moves again;
    //  * the BFS key is the NODE alone, not (node, rep): component
    //    membership already fixes each node's representative (the shared
    //    cluster labels), so hop propagation needn't carry it — half the
    //    key width in every shuffle, and rep attaches with ONE label join
    //    at the end instead of riding diameter-many passes.
    // Each pass min-aggregates same-level duplicates and anti-joins the
    // visited set (lazy union of the already-materialized level frames —
    // re-checkpointing the accumulated union each pass just re-writes the
    // same rows) so a node is emitted at its FIRST level only. The loop
    // runs diameter-many passes — near-dup clusters are dense, so 2-4 in
    // practice. Nothing is ever corpus×corpus: the frontier is
    // component-bounded and shrinks to empty.
    QueryDef(
      "p16_dup_graph_bfs",
      (s, dir) => {
        import s.implicits._
        val labels = dupClusterLabels(s, dir)
        // the shared src-partitioned adjacency (symmEdges) — same frame,
        // same partitioning contract as the per-call build it replaces
        val edges = symmEdges(s, dir)
        // delta-frontier cadence (r18): each level materializes FUSED
        // with its row count (GraftSession.materializeCounted) — the
        // count is the loop condition, so the separate per-hop isEmpty
        // job is gone; one action per level instead of two, and the
        // level frames carry exact statistics so the visited anti-join
        // and the frontier side of the expansion join auto-broadcast
        // while they are provably small. (A stride-2 variant — two exact
        // levels per fused job — was measured and REJECTED: the second
        // level re-plans the first's subtree three times, growing the
        // per-job stage count past what the saved job recovers.)
        var (frontier, frontierN) = GraftSession.materializeCounted(
          labels.select($"lab").distinct()
            .select($"lab".as("node"), lit(0L).as("hops")))
        var levels = List(frontier)
        while (frontierN > 0) {
          val visited = levels.map(_.select($"node")).reduce(_ unionByName _)
          val (next, nextN) = GraftSession.materializeCounted(frontier.as("f")
            .join(edges.as("e"), $"f.node" === $"e.src")
            .select($"e.dst".as("node"), ($"f.hops" + 1L).as("hops"))
            .groupBy($"node").agg(min($"hops").as("hops"))
            .join(visited, Seq("node"), "left_anti"))
          levels ::= next
          frontier = next
          frontierN = nextN
        }
        levels.reduce(_ unionByName _)
          .join(labels, "node")
          .select($"node".as("doc_id"), $"lab".as("rep"), $"hops")
          .orderBy($"rep", $"hops", $"doc_id")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        ${CLUSTER_LABELS_SQL},
        reps AS (SELECT DISTINCT rep FROM labels),
        bfs(node, rep, hops) AS (
          SELECT rep, rep, CAST(0 AS BIGINT) FROM reps
          UNION
          SELECT e.j, b.rep, b.hops + 1
          FROM bfs b JOIN edges e ON e.i = b.node
          WHERE b.hops < 64)
        SELECT node AS doc_id, rep, CAST(MIN(hops) AS BIGINT) AS hops
        FROM bfs GROUP BY node, rep ORDER BY rep, hops, doc_id"""),
    ),

    // ---- p17: soft-dedup-effective mixture — what the sampler really ----
    // ---- draws once d19's weights are in effect ----
    // p06's mixture maths assumed every document counts fully; d19's soft
    // dedup says a cluster member contributes 1/cluster_size of itself.
    // This is the composition: per source, raw vs EFFECTIVE token counts
    // (Σ tokens/cluster_size) and the effective sampling share — the
    // number that tells a trainer how much a source's apparent volume is
    // multiplicity inflation (raw ≫ effective means the source is mostly
    // near-copies of itself). Arithmetic is exact end-to-end: effective
    // tokens are ppm-scaled BIGINT integral divisions (n·10⁶ div size) so
    // the sums are order-independent and the share is an integer ratio —
    // no double ever enters. Shape: the ONE shared cluster contraction
    // (cached with p03/p11/d18/d19), shrink-only joins, a source-sized
    // aggregate, and a one-row broadcast total.
    QueryDef(
      "p17_softdedup_mixture",
      (s, dir) => {
        import s.implicits._
        val labels = dupClusterLabels(s, dir)
        val docs = t(s, dir, "documents")
          .withColumn("n",
            size(regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))).cast("long"))
          .select($"doc_id", $"source", $"n")
        val lab = docs.join(labels, $"doc_id" === $"node", "left")
          .select($"source", $"n", coalesce($"lab", $"doc_id").as("cluster_rep"))
        val per = lab.groupBy($"cluster_rep").agg(count(lit(1)).as("cluster_size"))
        val perSrc = lab.join(per, "cluster_rep")
          .withColumn("eff_q", expr("(n * 1000000) div cluster_size"))
          .groupBy($"source")
          .agg(count(lit(1)).as("raw_docs"), sum($"n").as("raw_tokens"),
            sum($"eff_q").as("eff_tokens_ppm"))
        val tot = perSrc.agg(sum($"eff_tokens_ppm").as("total_eff"))
        perSrc.join(broadcast(tot))
          .withColumn("eff_share_ppm", expr("(eff_tokens_ppm * 1000000) div total_eff"))
          .select($"source", $"raw_docs", $"raw_tokens", $"eff_tokens_ppm", $"eff_share_ppm")
          .orderBy($"source")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        ${CLUSTER_LABELS_SQL},
        dn AS (
          SELECT doc_id, source,
                 CAST(len($TOKS_SQL) AS BIGINT) AS n
          FROM documents),
        lab AS (
          SELECT d.source, d.n, COALESCE(l.rep, d.doc_id) AS cluster_rep
          FROM dn d LEFT JOIN labels l ON l.node = d.doc_id),
        per AS (
          SELECT cluster_rep, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_rep),
        src AS (
          SELECT source, COUNT(*) AS raw_docs, CAST(SUM(n) AS BIGINT) AS raw_tokens,
                 CAST(SUM((n * 1000000) // cluster_size) AS BIGINT) AS eff_tokens_ppm
          FROM lab JOIN per USING (cluster_rep) GROUP BY source),
        tot AS (SELECT CAST(SUM(eff_tokens_ppm) AS BIGINT) AS total_eff FROM src)
        SELECT source, raw_docs, raw_tokens, eff_tokens_ppm,
               (eff_tokens_ppm * 1000000) // total_eff AS eff_share_ppm
        FROM src CROSS JOIN tot ORDER BY source"""),
    ),

    // ---- p18: the corpus-build funnel report — every gate, one pass ----
    // The nightly end-to-end composition the individual operators exist
    // for, as ONE query: quality gate (p01's length + lexical-diversity
    // rule) → exact dedup among survivors (p01's keep-min-doc_id) →
    // near-dup canonical selection (d18's corpus-wide max-chars-then-
    // min-id canonicals over the ONE shared cluster contraction) →
    // per-source quota admission (p12's cap, earliest-doc_id-first like
    // the arrival-time IngestQuota, run on the custom TopKPerKey plan) —
    // with the per-source survivor count after EVERY stage plus the final
    // admitted token supply. This is the report a data-curation team
    // reads each morning: where documents die, and what the trainer
    // actually gets. Shape: each stage is a shrink-only semi-join off the
    // previous survivor set, the cluster labels are the cached
    // contraction shared with p03/p11/d18/d19/p17, the quota never sorts
    // a source's documents (bounded heaps), and the five per-source
    // stage counts are dimension-sized aggregates left-joined onto the
    // source list.
    QueryDef(
      "p18_corpus_build_report",
      (s, dir) => {
        import s.implicits._
        val Q = 8
        val docs = t(s, dir, "documents")
        val toksed = docs
          .withColumn("tk", regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0)))
          .withColumn("n", size($"tk").cast("long"))
          .withColumn("h", md5($"text"))
        // quality survivors persisted: the frame feeds its own stage
        // count, the exact-dedup keep set, and (through exact) two later
        // stages — each otherwise re-ran the tokenize + distinct + md5
        // pass over the corpus
        val quality = toksed
          .filter($"n" >= 25L &&
            size(array_distinct($"tk")).cast("double") >= $"n" * 0.4)
          .select($"doc_id", $"source", $"n", $"h")
          .persistOnce()
        val keep = quality.groupBy($"h").agg(min($"doc_id").as("doc_id"))
        val exact = quality.join(keep, Seq("h", "doc_id"), "left_semi")
          .persistOnce()
        // d18's corpus-wide canonical set (over ALL docs, then applied) —
        // read from the shared session cache (r18): the corpus-wide label
        // join + two aggregates previously re-ran per invocation
        val canon = canonFrames(s, dir)._2.select($"canonical_id".as("doc_id"))
        val deduped = exact.join(canon, Seq("doc_id"), "left_semi")
        val admitted = graft.plans.TopK.perKey(
          deduped.select($"source", $"doc_id", $"n"),
          Seq("source"), Seq("doc_id" -> true), Q)
        def cnt(df: DataFrame, name: String) =
          df.groupBy($"source").agg(count(lit(1)).as(name))
        cnt(docs, "docs_in")
          .join(cnt(quality, "after_quality"), Seq("source"), "left")
          .join(cnt(exact, "after_exact"), Seq("source"), "left")
          .join(cnt(deduped, "after_canonical"), Seq("source"), "left")
          .join(admitted.groupBy($"source")
            .agg(count(lit(1)).as("admitted"), sum($"n").as("final_tokens")),
            Seq("source"), "left")
          .na.fill(0L, Seq("after_quality", "after_exact", "after_canonical",
            "admitted", "final_tokens"))
          .orderBy($"source")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        ${CLUSTER_LABELS_SQL},
        tk AS (
          SELECT doc_id, source, n_chars, md5(text) AS h, $TOKS_SQL AS tk
          FROM documents),
        q AS (
          SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n, h
          FROM tk
          WHERE len(tk) >= 25
            AND CAST(len(list_distinct(tk)) AS DOUBLE) >= len(tk) * 0.4),
        k AS (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h),
        e AS (SELECT q.* FROM q JOIN k ON k.h = q.h AND k.doc_id = q.doc_id),
        lab AS (
          SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS cluster_rep, d.n_chars
          FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
        per AS (SELECT cluster_rep, MAX(n_chars) AS mx FROM lab GROUP BY cluster_rep),
        canon AS (
          SELECT MIN(lab.doc_id) AS doc_id
          FROM lab JOIN per ON lab.cluster_rep = per.cluster_rep
                           AND lab.n_chars = per.mx
          GROUP BY lab.cluster_rep),
        dd AS (SELECT e.* FROM e JOIN canon USING (doc_id)),
        adm AS (
          SELECT source, doc_id, n FROM (
            SELECT source, doc_id, n,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM dd) x WHERE rn <= 8),
        c0 AS (SELECT source, COUNT(*) AS docs_in FROM documents GROUP BY source),
        c1 AS (SELECT source, COUNT(*) AS after_quality FROM q GROUP BY source),
        c2 AS (SELECT source, COUNT(*) AS after_exact FROM e GROUP BY source),
        c3 AS (SELECT source, COUNT(*) AS after_canonical FROM dd GROUP BY source),
        c4 AS (SELECT source, COUNT(*) AS admitted, CAST(SUM(n) AS BIGINT) AS final_tokens
               FROM adm GROUP BY source)
        SELECT c0.source, c0.docs_in,
               COALESCE(c1.after_quality, 0) AS after_quality,
               COALESCE(c2.after_exact, 0) AS after_exact,
               COALESCE(c3.after_canonical, 0) AS after_canonical,
               COALESCE(c4.admitted, 0) AS admitted,
               COALESCE(c4.final_tokens, 0) AS final_tokens
        FROM c0
        LEFT JOIN c1 USING (source) LEFT JOIN c2 USING (source)
        LEFT JOIN c3 USING (source) LEFT JOIN c4 USING (source)
        ORDER BY c0.source"""),
    ),

    // ---- p19: deterministic per-epoch training order ----
    // Each training epoch needs a DIFFERENT but REPRODUCIBLE global
    // permutation of the corpus (same shuffle on every re-run, no RNG
    // state to checkpoint — the p02/p08 determinism contract applied to
    // ORDER instead of membership). Epoch e's sort key is
    // md5('epoch:<e>:' <> doc_id); positions come from the SAME two-pass
    // rank p07 uses (range-repartition on the hash + sortWithinPartitions
    // + zipWithIndex) — a distributed sort by a uniform key, NEVER a
    // single-partition row_number window. Emitting two epochs proves the
    // permutations differ while each stays reproducible; at 100 TB this
    // is one range-shuffle per epoch, the exact cost of writing the
    // epoch's shard manifest.
    QueryDef(
      "p19_epoch_shuffle",
      (s, dir) => {
        import s.implicits._
        val epochs = (0 until 2).map { e =>
          val keyed = t(s, dir, "documents")
            .select($"doc_id", md5(concat(lit(s"epoch:$e:"), $"doc_id")).as("k"))
            .repartitionByRange(8, $"k")
            .sortWithinPartitions($"k")
          val ids = keyed.rdd.zipWithIndex
            .map { case (r, i) => (r.getLong(0), i) }
          s.createDataFrame(ids).toDF("doc_id", "position")
            .withColumn("epoch", lit(e.toLong))
        }
        epochs.reduce(_ unionByName _)
          .select($"epoch", $"position", $"doc_id")
          .orderBy($"epoch", $"position")
      },
      Some("""
        SELECT epoch, CAST(row_number() OVER (
                 PARTITION BY epoch
                 ORDER BY md5('epoch:' || epoch || ':' || doc_id)) - 1 AS BIGINT)
                 AS position,
               doc_id
        FROM documents CROSS JOIN (SELECT unnest([CAST(0 AS BIGINT),
                                                  CAST(1 AS BIGINT)]) AS epoch) e
        ORDER BY epoch, position"""),
    ),

    // ---- p20: curriculum ordering — easy→hard phases, shuffled within ----
    // Curriculum learning's data-side contract: present high-quality
    // (easy) documents first and the noisy tail last, but keep each
    // phase internally SHUFFLED so no spurious ordering leaks into
    // training. Quality is an integer-exact proxy built from the shared
    // TextOps tokenizer (length credit + stopword-density credit — the
    // t04 composite in the div-exact domain, no float thresholds), the
    // phase is a fixed-threshold band (no global rank, so no
    // unpartitioned ntile window), and the global position comes from
    // the p19 machinery: ONE range shuffle on (phase, md5) + the
    // partition-ordered zipWithIndex — exactly the cost of writing the
    // curriculum's shard manifest. At 100 TB nothing here exceeds one
    // range shuffle; the scoring pass is a narrow per-row map.
    QueryDef(
      "p20_curriculum_order",
      (s, dir) => {
        import s.implicits._
        val stopArr = array(TextOps.stop.map(lit): _*)
        val scored = t(s, dir, "documents")
          .withColumn("toks", TextOps.toks($"text"))
          .withColumn("nt", size($"toks").cast("long"))
          .withColumn("ns",
            size(filter($"toks", x => array_contains(stopArr, x))).cast("long"))
          .withColumn("score_q",
            least($"nt", lit(100L)) * 50L + expr("ns * 5000 div greatest(nt, 1)"))
          .withColumn("phase_idx",
            when($"score_q" >= 5000L, 0).when($"score_q" >= 2500L, 1).otherwise(2))
          .withColumn("phase",
            when($"phase_idx" === 0, "easy").when($"phase_idx" === 1, "medium")
              .otherwise("hard"))
          .withColumn("k", md5(concat(lit("curriculum:"), $"doc_id")))
          .select($"doc_id", $"score_q", $"phase_idx", $"phase", $"k")
        val ranged = scored
          .repartitionByRange(8, $"phase_idx", $"k")
          .sortWithinPartitions($"phase_idx", $"k")
        val ids = ranged.rdd.zipWithIndex
          .map { case (r, i) => (r.getLong(0), r.getLong(1), r.getString(3), i) }
        s.createDataFrame(ids).toDF("doc_id", "score_q", "phase", "position")
          .select($"position", $"phase", $"doc_id", $"score_q")
          .orderBy($"position")
      },
      Some("""
        WITH scored AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS BIGINT) AS nt,
                 CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9'']+'),
                                      x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS ns
          FROM documents),
        ph AS (
          SELECT doc_id,
                 least(nt, 100) * 50 + ns * 5000 // greatest(nt, 1) AS score_q
          FROM scored),
        lab AS (
          SELECT doc_id, score_q,
                 CASE WHEN score_q >= 5000 THEN 0 WHEN score_q >= 2500 THEN 1
                      ELSE 2 END AS phase_idx,
                 CASE WHEN score_q >= 5000 THEN 'easy' WHEN score_q >= 2500 THEN 'medium'
                      ELSE 'hard' END AS phase
          FROM ph)
        SELECT CAST(row_number() OVER (
                 ORDER BY phase_idx, md5('curriculum:' || doc_id)) - 1 AS BIGINT)
                 AS position,
               phase, doc_id, score_q
        FROM lab ORDER BY position"""),
    ),

    // ---- p21: cluster transitivity — clique or chain? ----
    // The dup-graph QUALITY audit the component queries (p03/m10) can't
    // make: two clusters of the same size can be a CLIQUE (every member
    // near-dups every other — a true duplicate group, safe to collapse
    // to one canonical) or a CHAIN (A≈B≈C≈… with the ends unrelated —
    // LSH/threshold drift, where collapsing to one representative
    // destroys distinct documents). Transitivity separates them: per
    // cluster, 3·triangles / wedges (×10⁶ exact integral) is 1 for a
    // clique and →0 for a chain. Triangles are counted by COMPACT-FORWARD
    // over a DEGREE-ORIENTED edge list: each undirected edge points from
    // its lower-(degree, id) endpoint to the higher one — capping every
    // out-degree at O(√E) (a hub of degree d keeps out-edges only toward
    // its ≥-degree neighbors, of which there are ≤√(2E)) — then per-node
    // out-neighbor ARRAYS are intersected per edge:
    // tri(u→v) = |N⁺(u) ∩ N⁺(v)|, so each triangle {a→b, a→c, b→c} is
    // counted exactly once, at its (a,b) edge. This never materializes
    // wedge ROWS: near-dup components are near-cliques (sf0.1: 15.8M
    // wedges / 15.4M triangles over 166k edges — enumeration shuffled
    // 15.8M rows; measured 6.0 s → 2.3 s warm), while the intersection
    // form's join output stays EDGE-sized with O(√E)-bounded arrays —
    // the shape that survives both a skewed hub (orientation bounds the
    // array) and a dense clique (no wedge blow-up). Per-cluster counts
    // are identical to the oracle's id-oriented enumeration (all three
    // corners share a component label). Wedges are Σ d·(d−1)/2 from one
    // degree agg. Everything is pair-set-sized (the banded-LSH-bounded
    // edge list), never corpus-sized; size-2 clusters have no wedges and
    // report NULL.
    QueryDef(
      "p21_cluster_transitivity",
      (s, dir) => {
        import s.implicits._
        val labels = dupClusterLabels(s, dir)
        // ONE adjacency build feeds everything: symmetric edges, neighbor
        // degree attached by a single co-partitioned join (the degree agg's
        // hash(node) output is the join-side partitioning), then one
        // groupBy collecting (neighbor_degree, neighbor) structs. The
        // checkpointed frame is consumed three times (out-lists, per-node
        // stats, the probe side) as cheap per-row maps — the first cut
        // recomputed the two degree joins in every consumer, and the sf0.1
        // cost was pure exchange-scheduling, not data.
        // shared session adjacency + degrees (symmEdges/symmDeg) — the
        // same symmetrize + degree agg this query previously re-ran
        val symm = symmEdges(s, dir)
        val degF = symmDeg(s, dir).select($"src".as("dst"), $"deg".as("dd"))
        val adjFull = symm.join(degF, "dst")
          .groupBy($"src").agg(
            count(lit(1)).as("d"),
            sort_array(collect_list(struct($"dd", $"dst"))).as("nbr"))
          .materialized
        // Out-lists in (degree, id) orientation, re-sorted by plain id so
        // the merge kernel intersects on node identity; ei = this node's
        // i-side undirected edge count (i < j pairs), d(d-1)/2 = wedges —
        // all derived per-row from the one materialized adjacency.
        val out = adjFull.select($"src", $"d",
          expr("size(filter(nbr, x -> x.dst > src))").cast("long").as("ei"),
          sort_array(expr(
            "transform(filter(nbr, x -> x.dd > d OR (x.dd = d AND x.dst > src)), x -> x.dst)"))
            .as("out_ids"))
        // |N⁺(u) ∩ N⁺(v)| via the native zero-allocation sorted-merge
        // kernel — size(array_intersect(...)) builds a per-row hash set
        // plus a matched-element array it immediately discards.
        val interCnt = {
          import org.apache.spark.sql.graft.ColumnBridge
          ColumnBridge.column(graft.functions.SortedIntersectCount(
            ColumnBridge.expression($"nu"), ColumnBridge.expression($"nv")))
        }
        val triC = out
          .select($"src", $"out_ids".as("nu"), explode($"out_ids").as("dst"))
          .join(out.select($"src".as("dst"), $"out_ids".as("nv")), "dst")
          .join(labels, $"src" === labels("node"))
          .groupBy($"lab").agg(sum(interCnt).as("n_tri"))
        out.join(labels, out("src") === labels("node"))
          .groupBy($"lab").agg(
            count(lit(1)).as("size"),
            sum($"ei").as("n_edges"),
            sum(expr("d * (d - 1) div 2")).as("n_wedges"))
          .join(triC, Seq("lab"), "left")
          .na.fill(0L, Seq("n_tri"))
          .select($"lab".as("cluster_rep"), $"size", $"n_edges", $"n_tri",
            $"n_wedges",
            expr("CASE WHEN n_wedges > 0 THEN 3 * n_tri * 1000000 div n_wedges END")
              .as("transitivity_ppm"))
          .orderBy($"cluster_rep")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        $CLUSTER_LABELS_SQL,
        tri AS (
          SELECT e1.i AS node
          FROM pairs e1
          JOIN pairs e2 ON e2.i = e1.i AND e2.j > e1.j
          JOIN pairs e3 ON e3.i = e1.j AND e3.j = e2.j),
        tric AS (
          SELECT l.rep AS rep, COUNT(*) AS n_tri
          FROM tri t JOIN labels l ON l.node = t.node GROUP BY l.rep),
        edgec AS (
          SELECT l.rep AS rep, COUNT(*) AS n_edges
          FROM pairs p JOIN labels l ON l.node = p.i GROUP BY l.rep),
        deg AS (
          SELECT node, COUNT(*) AS d
          FROM (SELECT i AS node FROM pairs
                UNION ALL SELECT j AS node FROM pairs) x
          GROUP BY node),
        wedc AS (
          SELECT l.rep AS rep, CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
          FROM deg JOIN labels l ON l.node = deg.node GROUP BY l.rep),
        sz AS (SELECT rep, COUNT(*) AS size FROM labels GROUP BY rep)
        SELECT sz.rep AS cluster_rep, size, n_edges,
               COALESCE(n_tri, 0) AS n_tri, n_wedges,
               CASE WHEN n_wedges > 0
                    THEN 3 * COALESCE(n_tri, 0) * 1000000 // n_wedges END
                 AS transitivity_ppm
        FROM sz
        JOIN edgec USING (rep) JOIN wedc USING (rep) LEFT JOIN tric USING (rep)
        ORDER BY cluster_rep"""),
    ),

    // ---- p22: corpus datasheet — the dataset-card numbers in one pass ----
    // The composed summary a dataset release publishes (HF dataset-card /
    // datasheets-for-datasets): corpus size, token/char supply, source
    // and language breadth, exact-duplicate volume, and the near-dup
    // cluster footprint — every value an EXACT integer (no float ever
    // enters), melted to (metric, value) rows so downstream tooling
    // diffs datasheets across releases. Composition, not recompute: the
    // near-dup numbers read the ONE cached cluster contraction shared
    // with p03/p11/d18/p21. Shape: three corpus-linear aggregates (one
    // tokenize pass, one hash-group for exact dups, one doc-stat agg),
    // the label frame, then constant-sized unions — every corpus touch
    // is a map-side-combinable agg, nothing pair- or window-shaped.
    QueryDef(
      "p22_corpus_datasheet",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val tok = docs.select($"doc_id",
          size(TextOps.toks($"text")).cast("long").as("nt"))
        val ex = docs.groupBy(md5($"text").as("h")).agg(count(lit(1)).as("c"))
          .filter($"c" > 1L)
        val labels = dupClusterLabels(s, dir)
        def m(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("metric"), $"value")
        m("n_docs", docs.agg(count(lit(1)).as("value")))
          .unionAll(m("n_tokens", tok.agg(sum($"nt").as("value"))))
          .unionAll(m("n_chars", docs.agg(sum($"n_chars").as("value"))))
          .unionAll(m("n_sources", docs.agg(countDistinct($"source").as("value"))))
          .unionAll(m("n_langs", docs.agg(countDistinct($"lang").as("value"))))
          .unionAll(m("max_doc_tokens", tok.agg(max($"nt").as("value"))))
          .unionAll(m("min_doc_tokens", tok.agg(min($"nt").as("value"))))
          .unionAll(m("n_exact_dup_docs",
            ex.agg(coalesce(sum($"c" - 1L), lit(0L)).as("value"))))
          .unionAll(m("n_exact_dup_groups", ex.agg(count(lit(1)).as("value"))))
          .unionAll(m("n_neardup_docs", labels.agg(count(lit(1)).as("value"))))
          .unionAll(m("n_neardup_clusters",
            labels.agg(countDistinct($"lab").as("value"))))
          .orderBy($"metric")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        pairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        $CLUSTER_LABELS_SQL,
        tok AS (
          SELECT doc_id, CAST(len($TOKS_SQL) AS BIGINT) AS nt FROM documents),
        ex AS (
          SELECT md5(text) AS h, COUNT(*) AS c FROM documents
          GROUP BY h HAVING COUNT(*) > 1)
        SELECT metric, value FROM (
          SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
          UNION ALL SELECT 'n_tokens', CAST(SUM(nt) AS BIGINT) FROM tok
          UNION ALL SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
          UNION ALL SELECT 'n_sources', COUNT(DISTINCT source) FROM documents
          UNION ALL SELECT 'n_langs', COUNT(DISTINCT lang) FROM documents
          UNION ALL SELECT 'max_doc_tokens', CAST(MAX(nt) AS BIGINT) FROM tok
          UNION ALL SELECT 'min_doc_tokens', CAST(MIN(nt) AS BIGINT) FROM tok
          UNION ALL SELECT 'n_exact_dup_docs',
            CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM ex
          UNION ALL SELECT 'n_exact_dup_groups', COUNT(*) FROM ex
          UNION ALL SELECT 'n_neardup_docs', COUNT(*) FROM labels
          UNION ALL SELECT 'n_neardup_clusters', COUNT(DISTINCT rep) FROM labels
        ) z ORDER BY metric"""),
    ),

    // ---- p23: training-shard manifest (hash sharding + per-shard card) ----
    // The last step before a corpus ships to the trainer: deterministically
    // assign every document to one of 16 output shards by a salted content-
    // independent hash of its id (content-independent so re-crawls of the
    // same id land in the same shard; salted so the shard key is independent
    // of every other md5-derived bucket in the pipeline), then emit the
    // manifest row a shard file is published with — doc/token/char supply,
    // language and source breadth, the id range, and an order-independent
    // content checksum (sum of 32-bit doc fingerprints; readers re-derive it
    // to detect torn/partial shard writes — at extreme per-shard counts
    // (>2^31 docs) publish the sum as DECIMAL instead). Balance check is the
    // reader's diff of n_docs/n_tokens across rows. Scale shape: one
    // corpus-linear pass (md5 + tokenize inside codegen), then a map-side-
    // combinable aggregate onto a 16-key space; the physical shard write
    // would be `df.write.partitionBy("shard")` on this same key — no
    // window, no pair join, no skew (md5 is uniform).
    QueryDef(
      "p23_shard_manifest",
      (s, dir) => manifestAgg(shardCards(t(s, dir, "documents"))
        .select(col("shard"), col("lang"), col("source"),
          lit(1L).as("n_docs"), col("nt"), col("n_chars"),
          col("doc_id").as("min_id"), col("doc_id").as("max_id"), col("chk"))),
      Some(s"""
        WITH d AS (
          SELECT CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                           1, 6) AS BIGINT) % 16 AS INT) AS shard,
                 doc_id, lang, source, n_chars,
                 CAST(len($TOKS_SQL) AS BIGINT) AS nt,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)),
                      1, 8) AS BIGINT) AS chk
          FROM documents)
        SELECT shard, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
               CAST(SUM(chk) AS BIGINT) AS checksum
        FROM d GROUP BY shard ORDER BY shard"""),
    ),
  )

  /** Per-document shard-card projection — the shard key, token count, and
    * 32-bit content fingerprint p23 aggregates. Shared with the streaming
    * maintainer ([[graft.streaming.IncrementalShardManifest]]) so the batch
    * manifest and the incrementally-maintained one can never drift on the
    * hash/tokenize definitions. Adds `shard`/`nt`/`chk`; input needs
    * `doc_id` and `text`. */
  private[graft] def shardCards(docs: DataFrame): DataFrame =
    docs
      .withColumn("shard",
        (conv(substring(md5(concat(lit("shard:"), col("doc_id").cast("string"))),
          1, 6), 16, 10).cast("long") % 16L).cast("int"))
      .withColumn("nt", size(TextOps.toks(col("text"))).cast("long"))
      .withColumn("chk",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          md5(col("text")))), 1, 8), 16, 10).cast("long"))

  /** The manifest aggregate over shard-card rows at ANY granularity whose
    * additive columns are already partial sums — raw per-document cards
    * (`n_docs=1`, `min_id=max_id=doc_id`) and the streaming maintainer's
    * per-(shard,lang,source) state rows both qualify, which is exactly why
    * the two views are bit-identical: sums re-sum, min/max re-fold, and
    * distinct lang/source counts see the same key set either way. */
  private[graft] def manifestAgg(cards: DataFrame): DataFrame =
    cards.groupBy(col("shard"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("min_id")).as("min_doc_id"),
        max(col("max_id")).as("max_doc_id"),
        sum(col("chk")).as("checksum"))
      .orderBy(col("shard"))
}
