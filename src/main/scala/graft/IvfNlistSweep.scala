package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NLIST dial sweep for the IVF index — pins the "at 100 TB set
  * NLIST ≈ √n" guidance with measured recall/latency/scan-fraction rows
  * instead of an asserted rule of thumb.
  *
  * For each NLIST setting: build the index once (timed), then for each
  * NPROBE measure the ranked top-10 search latency, the candidate scan
  * fraction (probed cells' rows / corpus — the term that dominates at
  * scale, since per-query work is NLIST centroid compares + that
  * fraction of the corpus), recall@10 against exact ground truth, and
  * the cell-balance skew (max cell / mean — a skewed quantizer turns the
  * average scan fraction into a worst-case one). Ground truth per NLIST
  * is the same plan probed at nprobe = NLIST: every cell scanned
  * degenerates to exact search with identical tie-breaks, so no second
  * formulation can drift.
  *
  * The cost model the sweep exercises: per-query candidate work is
  * `nprobe × n / nlist`, centroid work is `nlist`; their sum is
  * minimized at `nlist = sqrt(nprobe × n)` — the √n rule at nprobe = 1.
  * Run at the derived sf1 set (`.bench-sf1`, built by [[BenchSf1]]) so
  * the dial is pinned an order of magnitude above the suite's sf0.1.
  *
  * Output: one JSON line, also written to `BENCH_ivf_nlist.json`.
  */
object IvfNlistSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", ".bench-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nlists = sys.env.getOrElse("SPARK_GRAFT_NLISTS", "16,32,64,128,256,512")
      .split(",").map(_.trim.toInt).toSeq
    val nprobes = sys.env.getOrElse("SPARK_GRAFT_NPROBES", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BenchLog.quietBoundedWindowWarnings()
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val sqrtN = math.sqrt(n.toDouble)
    def r3(v: Double): String = f"$v%.3f"

    val rows = nlists.map { nlist =>
      // build (cached per (session, dir, nlist)): force and time it
      val t0 = System.nanoTime()
      val (assigned, _) = graft.analytics.Similarity.ivfIndexFor(spark, sfDir, nlist)
      val corpusN = assigned.count() // forces the persisted build
      val buildSec = (System.nanoTime() - t0) / 1e9
      // cell balance: max cell over mean (worst-case vs average scan)
      val cells = assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("mx"), avg(col("c")).as("mean")).collect()(0)
      val skew = cells.getLong(0) / cells.getDouble(1)
      // ground truth: probe every cell (exact search, same tie-breaks)
      val exact = graft.analytics.Similarity.ivfTopKFor(spark, sfDir, nlist, nlist)
        .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val nQueries = exact.map(_._1).size.toDouble.max(1.0)
      // the recall denominator assumes the ranked top-k yields exactly 10
      // rows per query — fail loudly if tie behavior ever breaks that,
      // rather than shipping a silently mis-scaled recall
      require(exact.size == 10 * exact.map(_._1).size,
        s"nlist=$nlist ground truth has ${exact.size} rows for " +
          s"${exact.map(_._1).size} queries — expected exactly 10 per query")
      val probeRows = nprobes.filter(_ < nlist).map { np =>
        val t1 = System.nanoTime()
        graft.analytics.Similarity.ivfTopKFor(spark, sfDir, nlist, np)
          .write.format("noop").mode("overwrite").save()
        val searchSec = (System.nanoTime() - t1) / 1e9
        val got = graft.analytics.Similarity.ivfTopKFor(spark, sfDir, nlist, np)
          .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact & got).size / (10.0 * nQueries)
        val candN = graft.analytics.Similarity
          .ivfCandidatesFor(spark, sfDir, nlist, np).count()
        val candFrac = candN.toDouble / (nQueries * corpusN)
        s"""{"nprobe":$np,"recall_at_10":${r3(recall)},"search_sec":${r3(searchSec)},"cand_frac":${f"$candFrac%.4f"}}"""
      }
      println(s"[sweep] nlist=$nlist build=${r3(buildSec)}s skew=${r3(skew)}")
      s"""{"nlist":$nlist,"build_sec":${r3(buildSec)},"corpus":$corpusN,"max_cell_x_mean":${r3(skew)},"probes":${probeRows.mkString("[", ",", "]")}}"""
    }

    val json = s"""{"metric":"ivf_nlist_sweep","sf":"$sfDir","n_embeddings":$n,""" +
      s""""sqrt_n":${r3(sqrtN)},"rows":${rows.mkString("[", ",", "]")},""" +
      s""""method":"one index build per NLIST (timed, persisted), search timed as the ranked top-10 noop write per NPROBE, ground truth = the same plan probed at nprobe=NLIST (exact, identical tie-breaks), cand_frac = probed candidate rows / (queries x corpus). Cost model: per-query work = nlist centroid compares + nprobe x n/nlist candidate rows, minimized at nlist = sqrt(nprobe x n) - the SURVEY s8 'NLIST = sqrt(n)' rule at nprobe=1; the sweep pins where measured recall and scan fraction actually cross"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_ivf_nlist.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
