package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-key operator: exact parity with the window
  * rank-filter form on real data, correct under key-split across input
  * partitions (the partial/final merge) and under the partial-pass key cap,
  * and the promised plan shape — two TopKPerKeyExec nodes around one hash
  * exchange, NO WindowExec, no sort below the exchange (the only sort is
  * the spillable one over the partial pass's survivors). */
class TopKPerKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("topk-per-key-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // keep the window baselines REAL windows: without this exclusion the
    // RankFilterToTopK rewrite turns every expected-side query into the
    // operator under test and the parity checks compare it to itself
    .config("spark.sql.optimizer.excludedRules", "graft.plans.RankFilterToTopK")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("matches the window rank-filter on real data (desc order + tie-break)") {
    import spark.implicits._
    val topk = TopK.perKey(li,
      Seq("l_orderkey"),
      Seq("l_extendedprice" -> false, "l_linenumber" -> true), 3)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet

    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber")
    val expected = li.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet

    assert(topk.nonEmpty && topk === expected)
  }

  test("exact when a key's rows are split across many input partitions") {
    import spark.implicits._
    // force every key's rows to scatter: round-robin repartition by an
    // unrelated expression, so the partial pass sees each key fragmented
    val scattered = li.repartition(8, $"l_linenumber")
    val topk = TopK.perKey(scattered,
      Seq("l_orderkey"), Seq("l_quantity" -> true, "l_linenumber" -> true), 2)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_quantity".asc, $"l_linenumber")
    val expected = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(topk === expected)
  }

  test("plan: partial and final around one exchange; no window, no full-input sort") {
    import spark.implicits._
    val df = TopK.perKey(li, Seq("l_orderkey"),
      Seq("l_extendedprice" -> false, "l_linenumber" -> true), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert("TopKPerKey ".r.findAllIn(plan).size === 2, s"expected partial+final:\n$plan")
    assert(!plan.contains("WindowExec"), s"window should be gone:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"expected one hash exchange:\n$plan")
    // the SPILLABLE external sort sits between exchange and the final pass —
    // it sorts only the partial pass's survivors (≤ partitions × keys × k),
    // never the full input; the partial side must stay sort-free
    val partialRegion = plan.substring(plan.indexOf("Exchange hashpartitioning"))
    assert(!partialRegion.contains("Sort "),
      s"sort below the exchange would be a full-input sort:\n$plan")
    val finalRegion = plan.substring(0, plan.indexOf("Exchange hashpartitioning"))
    assert(finalRegion.contains("Sort "),
      s"expected the spillable sort feeding the streaming final pass:\n$plan")
  }

  test("exact under the partial-pass key cap (pass-through degradation)") {
    import spark.implicits._
    // with the cap far below the key count, most rows bypass the map-side
    // heap and flow through unreduced — the reduce side must still be exact
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber")
    val expected = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.topk.maxPartialKeys", "4")
    try {
      val capped = TopK.perKey(li, Seq("l_orderkey"),
        Seq("l_extendedprice" -> false, "l_linenumber" -> true), 2)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(capped === expected)
    } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
  }

  test("k larger than any group returns everything; k=1 returns per-key minimum") {
    import spark.implicits._
    val all = TopK.perKey(li, Seq("l_orderkey"), Seq("l_linenumber" -> true), 100)
    assert(all.count() === li.count())
    val k1 = TopK.perKey(li, Seq("l_orderkey"),
      Seq("l_quantity" -> true, "l_linenumber" -> true), 1)
      .groupBy($"l_orderkey").count().filter($"count" =!= 1).count()
    assert(k1 === 0L)
  }

  test("column names resolve with the session resolver (case-insensitive by default)") {
    import spark.implicits._
    // mixed-case names accepted, exactly like df.select would accept them
    val upper = TopK.perKey(li, Seq("L_ORDERKEY"),
      Seq("L_QUANTITY" -> true, "L_LINENUMBER" -> true), 1)
    val lower = TopK.perKey(li, Seq("l_orderkey"),
      Seq("l_quantity" -> true, "l_linenumber" -> true), 1)
    assert(upper.collect().toSet === lower.collect().toSet)
    val asofU = graft.plans.AsOf.join(
      li.select($"l_orderkey".as("k"), $"l_shipdate".as("t"), $"l_quantity"),
      li.select($"l_orderkey".as("k"), $"l_shipdate".as("t2"), $"l_tax"),
      "K", "k", "T", "T2")
    assert(asofU.count() > 0L)
    // unknown column still fails cleanly
    val e = intercept[IllegalArgumentException] {
      TopK.perKey(li, Seq("no_such"), Seq("l_quantity" -> true), 1)
    }
    assert(e.getMessage.contains("no_such"))
  }
}
