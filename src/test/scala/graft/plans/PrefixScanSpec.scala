package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix scan: exact parity with the unpartitioned
  * running window it replaces — max/sum/min, nulls, duplicate order keys,
  * skewed key distributions — plus the plan-shape promise: NO
  * unpartitioned WindowExec over the corpus-sized input (the only window
  * in the plan runs over the #buckets-row carry frame). */
class PrefixScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("prefix-scan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Seeded random rows (key, tie, value) with duplicate keys and nulls. */
  private def sample(n: Int, seed: Long, nullEvery: Int = 0) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v: java.lang.Long =
        if (nullEvery > 0 && i % nullEvery == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong - 500)
      // duplicate-heavy keys: ~n/8 distinct, exercising ties across rows
      (rnd.nextInt(math.max(n / 8, 1)).toLong, i.toLong, v)
    }.toDF("k", "tie", "v").repartition(7)
  }

  private def windowRef(df: org.apache.spark.sql.DataFrame,
      agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val w = Window.orderBy(col("k"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ref", agg(col("v")).over(w))
  }

  private def check(n: Int, seed: Long, nullEvery: Int): Unit = {
    import spark.implicits._
    for ((name, scanOp, aggC) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.Column],
         org.apache.spark.sql.Column, String) => org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      ("max", PrefixScan.runningMax, max),
      ("sum", PrefixScan.runningSum, sum),
      ("min", PrefixScan.runningMin, min))) {
      val df = sample(n, seed, nullEvery)
      val got = scanOp(df, Seq($"k", $"tie"), $"v", "run")
        .select($"tie", $"run").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
      val exp = windowRef(df, aggC)
        .select($"tie", $"ref").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
      assert(got == exp, s"$name scan diverges from the window reference " +
        s"(n=$n seed=$seed nullEvery=$nullEvery)")
    }
  }

  test("max/sum/min parity with the running window on duplicate-heavy keys") {
    check(n = 2000, seed = 7L, nullEvery = 0)
  }

  test("parity with nulls interleaved (scan skips them like the window)") {
    check(n = 1500, seed = 13L, nullEvery = 5)
  }

  test("parity on a tiny input (fewer rows than buckets)") {
    check(n = 3, seed = 21L, nullEvery = 0)
    check(n = 1, seed = 22L, nullEvery = 0)
  }

  test("parity on a heavily skewed key (one key dominates) AND the " +
      "dominant key is refined into >1 bucket by tie-column quantiles") {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    val df = (0 until 2000).map { i =>
      val k = if (rnd.nextInt(10) < 8) 42L else rnd.nextInt(100).toLong
      (k, i.toLong, java.lang.Long.valueOf(rnd.nextInt(100).toLong))
    }.toDF("k", "tie", "v").repartition(5)
    // bit-identical to the window reference, max/sum/min alike
    for ((scanOp, aggC) <- Seq[((org.apache.spark.sql.DataFrame,
        Seq[org.apache.spark.sql.Column], org.apache.spark.sql.Column,
        String) => org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      (PrefixScan.runningSum, sum), (PrefixScan.runningMax, max))) {
      val got = scanOp(df, Seq($"k", $"tie"), $"v", "run")
        .select($"tie", $"run").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = windowRef(df, aggC)
        .select($"tie", $"ref").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp)
    }
    // the single-task cliff is gone: the dominant key (80% of rows on 42)
    // no longer collapses into one bucket — its quantile-array copies are
    // refined into (k=42, tie-quantile) sub-boundaries
    val keyed = df.withColumn("__ps_k", $"k".cast("double"))
      .withColumn("__ps_k2", $"tie".cast("double"))
    val bounds = PrefixScan.boundariesFor(keyed,
      math.max(spark.sparkContext.defaultParallelism, 1), "__ps_k", Some("__ps_k2"))
    val subBounds = bounds.filter(b => b._1 == 42.0 && b._2.isDefined)
    assert(subBounds.size >= 1,
      s"dominant key was not refined; boundaries: $bounds")
    // sub-boundaries split 42's rows into >1 bucket (each boundary adds one)
    assert(subBounds.map(_._2.get).distinct.size == subBounds.size)
  }

  test("NON-NUMERIC tie column on a dominant key: refinement is type-gated " +
      "off (logged) and parity still holds exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(101L)
    // 80% of rows on one key, tie is a STRING — refinement must not run
    // (a double cast would not preserve the string's own sort order)
    val df = (0 until 1200).map { i =>
      val k = if (rnd.nextInt(10) < 8) 42L else rnd.nextInt(50).toLong
      (k, f"t$i%06d", java.lang.Long.valueOf(rnd.nextInt(100).toLong))
    }.toDF("k", "tie", "v").repartition(5)
    // boundariesFor-level fallback: an all-null tie column (what a
    // non-castable tie would produce) degrades to the unrefined boundary
    val keyed = df.withColumn("__ps_k", $"k".cast("double"))
      .withColumn("__ps_k2", expr("try_cast(tie as double)"))
    val bounds = PrefixScan.boundariesFor(keyed,
      math.max(spark.sparkContext.defaultParallelism, 1), "__ps_k", Some("__ps_k2"))
    assert(bounds.count(_._1 == 42.0) == 1 && bounds.forall(_._2.isEmpty),
      s"expected the fallback single boundary for key 42, got $bounds")
    // and the scan output is still bit-identical to the window form —
    // the string tie still participates in the in-bucket sort
    val got = PrefixScan.runningSum(df, Seq($"k", $"tie"), $"v", "run")
      .select($"tie", $"run").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Window.orderBy($"k", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ref", sum($"v").over(w))
      .select($"tie", $"ref").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("NUMERIC-STRING tie column (lexicographic \"10\" < \"2\" but numeric " +
      "10 > 2) on a dominant key: the type gate prevents silent numeric " +
      "sub-bucketing and parity holds on the string's own order") {
    import spark.implicits._
    val rnd = new scala.util.Random(103L)
    // ties are DIGIT STRINGS of varying length — fully castable to double,
    // so a cast-success gate would refine and misbucket ("10" sorts before
    // "2" lexicographically but after it numerically); only a TYPE gate
    // keeps the sub-bucket order aligned with the in-bucket sort
    val df = (0 until 1200).map { i =>
      val k = if (rnd.nextInt(10) < 8) 42L else rnd.nextInt(50).toLong
      (k, i.toString, java.lang.Long.valueOf(rnd.nextInt(100).toLong))
    }.toDF("k", "tie", "v").repartition(5)
    val got = PrefixScan.runningSum(df, Seq($"k", $"tie"), $"v", "run")
      .select($"tie", $"run").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Window.orderBy($"k", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ref", sum($"v").over(w))
      .select($"tie", $"ref").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp,
      "castable string ties must NOT be numerically sub-bucketed")
  }

  test("single-column order: skew refinement degrades gracefully (no tie " +
      "column to refine on) and parity still holds") {
    import spark.implicits._
    // distinct keys so the single-column order is still total
    val df = (0 until 300).map(i => (i.toLong, java.lang.Long.valueOf(i % 7)))
      .toDF("k", "v").repartition(3)
    val got = PrefixScan.runningSum(df, Seq($"k"), $"v", "run")
      .select($"k", $"run").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ref", sum($"v").over(w))
      .select($"k", $"ref").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("plan shape: no unpartitioned window over the corpus input") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val df = sample(5000, 31L)
    val out = PrefixScan.runningMax(df, Seq($"k", $"tie"), $"v", "run")
    val unpart = out.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // the ONLY unpartitioned window permitted is the carry fold — its
    // input is the per-bucket aggregate, i.e. at most #buckets rows,
    // which shows as a HashAggregate directly under the window's sort
    assert(unpart.size == 1, s"expected exactly the carry window, got ${unpart.size}")
    val overAgg = unpart.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(overAgg.nonEmpty,
      "carry window must read the per-bucket aggregate, not corpus rows")
    // and the output column count is input + 1 (no helper columns leak)
    assert(out.columns.toSeq == df.columns.toSeq :+ "run")
  }

  test("runtime plan: the carries side REUSES the one corpus bucket shuffle") {
    // The regression this pins: carries derived from the pre-scan frame
    // let column pruning produce a narrower exchange subtree, so the
    // carries pass re-scanned and re-shuffled the whole corpus. Deriving
    // them from the MapPartitions output blocks pruning, and AQE's stage
    // cache turns the second consumer into a ReusedExchange of the ONE
    // bucket shuffle — visible only in the EXECUTED adaptive plan.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val df = sample(5000, 47L)
    val out = PrefixScan.runningMax(df, Seq($"k", $"tie"), $"v", "run")
    out.collect()
    // walk the EXECUTED adaptive plan (leaf-node stages hide their
    // subtrees from the plain TreeNode traversal)
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      // query stages (shuffle AND broadcast) are leaves hiding subtrees
      case s: QueryStageExec => p +: walk(s.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val nodes = walk(out.queryExecution.executedPlan)
    val bucketShuffles = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("__ps_bkt") => e
    }
    val reused = nodes.collect {
      case r: ReusedExchangeExec
        if r.child.outputPartitioning.toString.contains("__ps_bkt") => r
    }
    // the repartition(n, bkt) corpus shuffle materializes ONCE; the
    // carries consumer reads it as a ReusedExchange. (The only other
    // __ps_bkt exchange permitted is the tiny per-bucket aggregate's
    // ENSURE_REQUIREMENTS shuffle, which repartitions #buckets-sized
    // aggregate rows, not corpus rows.)
    assert(reused.nonEmpty,
      "carries must reuse the corpus bucket exchange, not recompute it")
    val corpusShuffles = bucketShuffles.filter(_.shuffleOrigin.toString == "REPARTITION_BY_NUM")
    assert(corpusShuffles.size == 1,
      s"expected one materialized corpus bucket shuffle, got ${corpusShuffles.size}")
  }

  test("non-deterministic input lineage is auto-persisted, and the scan's " +
      "carries stay consistent with the rows it actually emitted") {
    import spark.implicits._
    // rand()-tainted value column: without one shared materialization the
    // quantile job / scan pass / carries pass would each see DIFFERENT
    // values and the combined output would be internally inconsistent
    val df = spark.range(0, 5000, 1, 7).toDF("tie")
      .withColumn("v", (rand() * 1000).cast("long") - lit(500))
      .withColumn("k", pmod(col("tie"), lit(611)))
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val got = PrefixScan.runningSum(df, Seq($"k", $"tie"), $"v", "run")
      .select($"k", $"tie", $"v", $"run").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // enforcement visible: the input frame got persisted by the scan
    assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "scan must auto-persist a non-deterministic input")
    // self-consistency: the running sum over the OUTPUT's own (k, tie)
    // order equals each row's carried value — true iff every pass read
    // the same materialization of the random values
    var acc = 0L
    got.foreach { case (_, _, v, run) =>
      acc += v
      assert(run == acc, "carries diverged from the emitted rows — the " +
        "non-deterministic lineage was re-executed between passes")
    }
    df.unpersist()
    // a deterministic input is NOT persisted by the scan
    val det = spark.range(0, 1000, 1, 3).toDF("tie")
      .withColumn("v", pmod(col("tie") * 37, lit(101)))
      .withColumn("k", pmod(col("tie"), lit(13)))
    PrefixScan.runningSum(det, Seq($"k", $"tie"), $"v", "run").collect()
    assert(det.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "deterministic inputs must not be silently cached")
  }
}
