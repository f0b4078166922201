package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join: parity with the window-composition form (e10)
  * on real events data, edge semantics (no prior right row, inclusive
  * equal timestamps, null keys/times), and the promised plan shape —
  * one merge exec over two sorted, co-partitioned children; no union,
  * no window. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("asof-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def events = graft.TestTables.events(spark)
    .withColumn("us", unix_micros(col("ts")))
    .select("event_id", "user_id", "event_type", "us")

  test("matches the e10 window composition on real purchases/views") {
    import spark.implicits._
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"us")
    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"event_id".as("v_event"), $"us".as("v_us"))

    val got = AsOf.join(purchases, views, "user_id", "v_user", "us", "v_us")
      .select($"user_id", $"event_id", $"us", $"v_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // e10's composition: last view at-or-before each purchase
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy($"us", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = events.filter($"event_type".isin("view", "purchase"))
      .withColumn("tag", when($"event_type" === "view", 0).otherwise(1))
      .withColumn("view_us",
        last(when($"event_type" === "view", $"us"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"us", $"view_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    assert(got.nonEmpty && got === expect)
  }

  test("edges: no prior right row -> null; equal timestamp is inclusive") {
    import spark.implicits._
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"), (3L, 10L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "x"), (1L, 150L, "y"), (2L, 60L, "z"))
      .toDF("rk", "rt", "rtag")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select($"k", $"t", $"tag", $"rtag")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) null else x.getString(3))).toSet
    assert(out === Set(
      (1L, 100L, "a", "x"), // equal timestamp matches (at-or-before)
      (1L, 200L, "b", "y"), // latest of the two priors
      (2L, 50L, "c", null), // right row exists but only later
      (3L, 10L, "d", null))) // key absent on the right
  }

  test("null keys and null times never match and never stall the merge") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), "a"), (None, Some(5L), "n"), (Some(1L), None, "m"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), None, "nullt"), (Some(1L), Some(90L), "ok"), (None, Some(1L), "nullk"))
      .toDF("rk", "rt", "rtag")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select($"tag", $"rtag")
      .collect().map(x => (x.getString(0), if (x.isNullAt(1)) null else x.getString(1))).toSet
    assert(out === Set(("a", "ok"), ("n", null), ("m", null)))
  }

  test("self-join (shared lineage) resolves without column aliasing") {
    import spark.implicits._
    // both frames derive from the SAME plan — without re-aliasing, the
    // right child would share every ExprId with the left, making the
    // node's output ambiguous downstream. No manual .as(...) here.
    val base = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val out = AsOf.join(base, base.filter($"t" < 150L), "k", "k", "t", "t")
    // output must carry 6 DISTINCT attributes (left 3 + re-aliased right 3)
    val ids = org.apache.spark.sql.graft.PlanBridge.logicalPlan(out)
      .output.map(_.exprId)
    assert(ids.distinct.size === 6, s"duplicate ExprIds in output: $ids")
    // each left row matched against the <150 subset of itself
    val rows = out.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(5)) null else r.getString(5))
    }.toSet
    assert(rows === Set(
      (1L, 100L, "a", "a"), // t=100 matches itself (at-or-before, <150 kept)
      (1L, 200L, "b", "a"), // latest prior under 150 is t=100
      (2L, 50L, "c", "c")))
  }

  test("plan: merge exec over two sorted co-partitioned children") {
    import spark.implicits._
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"us")
    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"us".as("v_us"))
    val df = AsOf.join(purchases, views, "user_id", "v_user", "us", "v_us")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Union"), s"\n$plan")
    // count only the exchanges the JOIN requires (ENSURE_REQUIREMENTS):
    // the shared loader's one-time cache repartition prints inside the
    // InMemoryRelation subtree as REPARTITION_BY_NUM and is not join cost
    assert("Exchange hashpartitioning\\([^)]*\\), ENSURE_REQUIREMENTS".r
      .findAllIn(plan).size === 2, s"\n$plan")
    assert("Sort ".r.findAllIn(plan).size === 2, s"\n$plan")
  }
}
