package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite: a user-written window rank-filter that DROPS the
  * rank column plans as TopKPerKey (no WindowExec), produces the same
  * rows as the un-rewritten plan, and does NOT fire when the rank column
  * is kept or the function is rank() (which admits >k rows per key). */
class RankFilterToTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val EXCLUDE = "spark.sql.optimizer.excludedRules"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("rank-filter-rewrite-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  private def rankFilterQuery = {
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber")
    li.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice") // rn dropped
  }

  test("rewrites to TopKPerKey and matches the window result exactly") {
    val rewritten = rankFilterQuery
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window should be gone:\n$plan")

    val got = rewritten.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    spark.conf.set(EXCLUDE, "graft.plans.RankFilterToTopK")
    try {
      val baseline = rankFilterQuery
      val bplan = baseline.queryExecution.executedPlan.toString
      assert(bplan.contains("Window"), s"exclusion should restore the window:\n$bplan")
      val expect = baseline.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got.nonEmpty && got === expect)
    } finally spark.conf.unset(EXCLUDE)
  }

  test("does not fire when the rank column survives or for rank()") {
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber")
    val kept = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"),
      "rn kept → window must remain")
    val rk = li.withColumn("rk", rank().over(w)).filter($"rk" <= 2)
      .select($"l_orderkey", $"l_linenumber")
    assert(rk.queryExecution.executedPlan.toString.contains("Window"),
      "rank() admits ties beyond k → must not rewrite")
  }
}
