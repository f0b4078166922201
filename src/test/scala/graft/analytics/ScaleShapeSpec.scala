package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape regression suite: locks the plan properties that matter at
  * 100 TB — predicate/column pushdown to the parquet scan, co-located
  * bucketed joins with no exchange, and salted-join equivalence under a
  * hot key. Correctness suites prove the engine right; this one proves
  * the plans stay the plans we'd want on a 1000-executor cluster.
  */
class ScaleShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("scale-shape-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", wh)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("filter and projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(l_quantity,40") && plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"filter not pushed to scan:\n$plan")
    val scanSchema = "ReadSchema: struct<l_orderkey:bigint,l_quantity:"
    assert(plan.contains(scanSchema), s"scan reads more columns than the projection:\n$plan")
  }

  test("bucketed co-located join runs with no shuffle exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity"))
    // force execution so AQE settles the final plan
    val n = joined.count()
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    val joinRegion = plan.split("HashAggregate").head
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!joinRegion.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles its inputs:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), s"bucketed scan not used:\n$plan")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
  }

  test("salted join equals the plain join under a 90% hot key") {
    import spark.implicits._
    val big = (1 to 2000).map { i =>
      (if (i <= 1800) 7L else (i % 50).toLong, s"v$i")
    }.toDF("k", "payload")
    val small = (0 until 50).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    val a = plain.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = salted.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a === b)
    // the hot key's rows really scatter: after salting, no single
    // (k, salt) group holds more than ~1/2 of the hot key's volume
    val lanes = big.withColumn("__salt", floor(rand(42) * 8).cast("int"))
      .filter($"k" === 7L).groupBy($"__salt").count()
      .collect().map(_.getLong(1))
    assert(lanes.length >= 4, s"hot key landed in too few lanes: ${lanes.toSeq}")
    assert(lanes.max < 1800 / 2, s"one lane still holds most of the hot key: ${lanes.toSeq}")
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").partitionBy("l_returnflag").saveAsTable("lineitem_p")
    // the dim must be a REAL scan with an unfolded filter — a local
    // relation constant-folds the predicate away and the pruning rule no
    // longer sees a selective filter on the build side
    Seq(("A", "returned"), ("N", "kept"), ("R", "refused"))
      .toDF("flag", "label")
      .write.mode("overwrite").saveAsTable("flag_dim")
    // selective dim filter + equi-join on the partition column: the scan
    // must prune partitions from the broadcast result at RUNTIME (DPP),
    // not read all three and filter post-join
    val q = spark.table("lineitem_p")
      .join(spark.table("flag_dim").filter($"label" === "returned"),
        $"l_returnflag" === $"flag")
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("curated corpus writes partition-by-lang layout with bounded files") {
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang")
      .option("maxRecordsPerFile", 1000)
      .parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length >= 3, s"expected per-lang partitions, got ${dirs.toSeq}")
    // one shuffle by the partition column ⇒ one file per partition dir
    // (not cores × langs tiny files — the small-files failure mode)
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"$d has $files files; expected 1 after repartition(lang)")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("unpartitioned windows only over bounded inputs") {
    // Window.orderBy with no partitionBy funnels its whole input through ONE
    // task ("WindowExec: No Partition Defined" at runtime) — fine over a
    // bounded frame (a limit(k) result, a ≤64-bucket histogram, per-sink
    // checkpoints), fatal over a base table at 100 TB. This locks the
    // offender set to the queries whose window input is provably bounded;
    // q15/q28/c02 were rewritten to max-join / two-pass-rank / limit+max
    // forms and must never reappear here.
    val allowed = Set(
      "e05_top_users",      // window over limit(20) survivors
      "t13_length_histogram", // ≤64 histogram buckets
      "t17_zipf_slope",     // rank over the top-1000 frame
      "p06_temperature_mix",  // 10-row source-mix table
      "p13_unimax_budget",  // waterfilling over one row per language
      "p14_dsir_selection", // rank over the top-100 frame (TakeOrdered first)
      "s15_hybrid_rrf",     // rank windows over ≤50-row TakeOrdered frames
      "c04_min_progress_across_sinks", // one row per sink
      "e23_cmsketch_heavy_hitters", // rank over the limit(20) survivors
      "c07_seq_coverage_audit", // lag over the bucket frame (id-range/1000 rows)
      "e31_watermark_lag",  // PrefixScan's carry window over #buckets rows
      "e33_watermark_sizing", // same PrefixScan carry window as e31
    )
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val unpart = fn(spark, sf).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (unpart.nonEmpty && !allowed(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over a possibly-unbounded input in: ${offenders.mkString(", ")}")
  }

  test("no uncapped shingle-index self-join in any declared query plan") {
    // The corpus-quadratic failure mode the d12/d16 gates used to have: a
    // join whose BOTH sides are the raw shingle inverted index (doc_id, s)
    // with nothing bounding the per-shingle fan-out in between. On a hot
    // (stopword-ish) shingle that join explodes at scale. A side stops
    // being "raw" when, between the join and the index scan, there is:
    //  - an md5-bucket eval-sample Filter (the d12/d16 sampled-truth form),
    //  - a document-frequency cap Filter (d02's stop-shingle cap, named df),
    //  - an Aggregate (unique-per-group-key ⇒ linear join fan-out, d13), or
    //  - another Join (candidate/pair-set restriction, d03/d15/d16).
    // A side under an explicit broadcast() hint is also bounded: broadcast
    // is the query's declaration that the side fits in memory (d07's eval
    // suite) — it fails loudly at scale rather than exploding quadratically.
    // Allow-list NOTHING: a future gate that reintroduces the full-corpus
    // truth join must fail here, not resurface as a bench regression.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Filter => LFilter, Join => LJoin, LogicalPlan, HintInfo, BROADCAST}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    def isShingleLeaf(p: LogicalPlan): Boolean = p match {
      case m: InMemoryRelation => m.output.map(_.name).toSet == Set("doc_id", "s")
      case _ => false
    }
    def rawIndexSide(p: LogicalPlan): Boolean = p match {
      case _ if isShingleLeaf(p) => true
      case f: LFilter =>
        val cond = f.condition.toString.toLowerCase
        val bounding = cond.contains("md5") ||
          f.condition.references.exists(_.name == "df")
        !bounding && rawIndexSide(f.child)
      case _: LAgg | _: LJoin => false
      case _ => p.children.exists(rawIndexSide)
    }
    def bcast(h: Option[HintInfo]): Boolean = h.exists(_.strategy.contains(BROADCAST))
    val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val joins = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case j: LJoin if rawIndexSide(j.left) && rawIndexSide(j.right) &&
          !bcast(j.hint.leftHint) && !bcast(j.hint.rightHint) => j
      }
      if (joins.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"uncapped shingle-index self-join (corpus-quadratic at scale) in: ${offenders.mkString(", ")}")
  }

  test("no non-broadcast cartesian product in any declared query plan") {
    // BroadcastNestedLoopJoin with a broadcast query side is the intended
    // shape for the ANN fan-outs (corpus x 5 queries); CartesianProductExec
    // shuffles both sides all-to-all and must only appear in the one
    // operator that is BY CONTRACT a cross join (q35).
    val allowed = Set("q35_cross_join_matrix")
    val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (allowed(name)) None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian products in: ${offenders.mkString(", ")}")
  }
}
