package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Locks IncrementalJoin's per-batch PLAN shape — the property that makes
  * the maintainer viable when the snapshots are 10⁹ rows and a batch is
  * 10³: every contact with a snapshot (either side, or the old view) is a
  * semi/anti join against the BROADCAST touched-key set, the only
  * side-to-side join runs over the touched keys' rows, and nothing in the
  * batch dataflow is a cartesian. The parity specs prove the maintainer
  * is RIGHT; this spec proves it stays CHEAP. */
class IncrementalJoinShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-join-shape-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("per-batch view/changelog plans: snapshots touched only via broadcast " +
      "semi/anti joins on the touched-key set; no cartesian anywhere") {
    import spark.implicits._
    val curL = Some(Seq((1L, 10L, 100L, 5.0), (2L, 11L, 101L, 6.0))
      .toDF("user_id", "event_id", "us", "value"))
    val curR = Some(Seq((1L, 20L, 102L, 7.0), (3L, 21L, 103L, 8.0))
      .toDF("user_id", "event_id", "us", "value"))
    val oldView = Some(Seq((1L, 10L, 5.0, 20L, 7.0))
      .toDF("user_id", "l_event_id", "l_value", "r_event_id", "r_value"))
    val latest = Seq(("L", 2L, 12L, 110L, 9.0), ("R", 2L, 22L, 111L, 9.5))
      .toDF("side", "user_id", "event_id", "us", "value")
    val touched = latest.select("user_id").distinct()

    val (newL, newR, changelog, newView) =
      IncrementalJoin.mergedFrames(curL, curR, oldView, latest, touched)

    for ((name, df) <- Seq("newL" -> newL, "newR" -> newR,
        "changelog" -> changelog, "newView" -> newView)) {
      val plan = df.queryExecution.sparkPlan
      assert(plan.collectWithSubqueries { case c: CartesianProductExec => c }.isEmpty,
        s"$name plan grew a cartesian:\n$plan")
      assert(!plan.toString.contains("BroadcastNestedLoopJoin"),
        s"$name plan grew a nested-loop join:\n$plan")
    }
    // the view rebuild: untouched rows pass through a broadcast ANTI join,
    // each side reaches the touched join through a broadcast SEMI join
    val viewJoins = newView.queryExecution.sparkPlan
      .collectWithSubqueries { case b: BroadcastHashJoinExec => b.joinType.sql }
    assert(viewJoins.count(_ == "LEFT ANTI") >= 1,
      s"untouched pass-through is not a broadcast anti join: $viewJoins")
    assert(viewJoins.count(_ == "LEFT SEMI") >= 2,
      s"side filters are not broadcast semi joins: $viewJoins")
    // the side merges: anti join against the (broadcastable) touched keys
    val sideJoins = newL.queryExecution.sparkPlan
      .collectWithSubqueries { case b: BroadcastHashJoinExec => b.joinType.sql }
    assert(sideJoins.count(_ == "LEFT ANTI") >= 1,
      s"side merge is not a broadcast anti join: $sideJoins")

    // and the frames are still semantically right on this fixture
    val v = newView.as[(Long, Long, Double, Long, Double)].collect().toSet
    assert(v === Set((1L, 10L, 5.0, 20L, 7.0), (2L, 12L, 9.0, 22L, 9.5)))
    val cl = changelog.as[(String, Long, Long, Double, Long, Double)].collect().toSet
    assert(cl === Set(("+", 2L, 12L, 9.0, 22L, 9.5)))
  }
}
