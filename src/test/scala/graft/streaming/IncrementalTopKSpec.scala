package graft.streaming

import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming per-key top-k materialized view == batch TopK.perKey over
  * the surviving rows, across micro-batches including retractions (a
  * delete that evicts a current top-k member must PROMOTE the discarded
  * runner-up — the case a k-row sketch cannot serve), key-moving updates,
  * and foreachBatch replays. */
class IncrementalTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-topk-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val K = 2

  /** (op, seq, id, key_old, score_old, key_new, score_new) */
  private type Op = (String, Long, Long, Option[String], Option[Double], Option[String], Option[Double])

  private def opsDf(ops: Seq[Op]): DataFrame = {
    import spark.implicits._
    ops.toDF("op", "seq", "id", "key_old", "score_old", "key_new", "score_new")
  }

  private def viewRows(root: String): Set[(String, Long, Double)] =
    IncrementalTopK.read(spark, root).get
      .select("key", "id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  /** Batch oracle: TopK.perKey over the CURRENT surviving rows. */
  private def expected(rows: Seq[(Long, String, Double)]): Set[(String, Long, Double)] = {
    import spark.implicits._
    TopK.perKey(rows.toDF("id", "key", "score"),
      Seq("key"), Seq("score" -> false, "id" -> true), K)
      .select("key", "id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("view tracks batch TopK.perKey through inserts, evicting deletes, " +
      "key-moving updates, and a replayed batch") {
    val root = Files.createTempDirectory("inc-topk").toString

    // batch 0: inserts — key a holds {1:9.0, 2:7.0, 3:5.0}, key b {4:3.0}
    IncrementalTopK.merge(opsDf(Seq(
      ("i", 1L, 1L, None, None, Some("a"), Some(9.0)),
      ("i", 2L, 2L, None, None, Some("a"), Some(7.0)),
      ("i", 3L, 3L, None, None, Some("a"), Some(5.0)),
      ("i", 4L, 4L, None, None, Some("b"), Some(3.0)))), 0L, root, K)
    var live = Seq((1L, "a", 9.0), (2L, "a", 7.0), (3L, "a", 5.0), (4L, "b", 3.0))
    assert(viewRows(root) == expected(live))
    assert(viewRows(root) == Set(("a", 1L, 9.0), ("a", 2L, 7.0), ("b", 4L, 3.0)))

    // batch 1: DELETE a top-k member of a — the runner-up (id 3) must be
    // promoted into the view even though the previous view never held it
    IncrementalTopK.merge(opsDf(Seq(
      ("d", 5L, 2L, Some("a"), Some(7.0), None, None))), 1L, root, K)
    live = Seq((1L, "a", 9.0), (3L, "a", 5.0), (4L, "b", 3.0))
    assert(viewRows(root) == expected(live))
    assert(viewRows(root) == Set(("a", 1L, 9.0), ("a", 3L, 5.0), ("b", 4L, 3.0)))

    // batch 2: update MOVES id 1 from key a to key b with a new score —
    // both keys re-rank (a shrinks to one row, b gains a winner)
    IncrementalTopK.merge(opsDf(Seq(
      ("u", 6L, 1L, Some("a"), Some(9.0), Some("b"), Some(8.0)))), 2L, root, K)
    live = Seq((1L, "b", 8.0), (3L, "a", 5.0), (4L, "b", 3.0))
    assert(viewRows(root) == expected(live))
    assert(viewRows(root) == Set(("a", 3L, 5.0), ("b", 1L, 8.0), ("b", 4L, 3.0)))

    // batch 2 REPLAYED (foreachBatch crash-recovery): skipped, view unchanged
    IncrementalTopK.merge(opsDf(Seq(
      ("u", 7L, 1L, Some("a"), Some(9.0), Some("b"), Some(8.0)))), 2L, root, K)
    assert(viewRows(root) == expected(live))

    // batch 3: score-only update re-orders within key b; untouched key a
    // carries over
    IncrementalTopK.merge(opsDf(Seq(
      ("u", 8L, 4L, Some("b"), Some(3.0), Some("b"), Some(8.5)))), 3L, root, K)
    live = Seq((1L, "b", 8.0), (3L, "a", 5.0), (4L, "b", 8.5))
    assert(viewRows(root) == expected(live))
    assert(viewRows(root) == Set(("a", 3L, 5.0), ("b", 4L, 8.5), ("b", 1L, 8.0)))

    // base mirrors the surviving rows exactly
    val base = IncrementalTopK.readBase(spark, root).get
      .select("id", "key", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(base == live.toSet)
  }

  test("one batch with several ops per id nets to the last-by-seq state") {
    val root = Files.createTempDirectory("inc-topk-multi").toString
    // insert-then-delete nets to ABSENCE; insert-then-update nets to ONE
    // row at the updated score; out-of-seq-order arrival must not matter
    IncrementalTopK.merge(opsDf(Seq(
      ("d", 22L, 1L, Some("a"), Some(9.0), None, None),   // arrives first,
      ("i", 21L, 1L, None, None, Some("a"), Some(9.0)),   // seq says i < d
      ("u", 24L, 2L, Some("a"), Some(4.0), Some("a"), Some(6.0)),
      ("i", 23L, 2L, None, None, Some("a"), Some(4.0)),
      ("i", 25L, 3L, None, None, Some("a"), Some(1.0)))), 0L, root, K)
    val live = Seq((2L, "a", 6.0), (3L, "a", 1.0))
    assert(viewRows(root) == expected(live))
    assert(viewRows(root) == Set(("a", 2L, 6.0), ("a", 3L, 1.0)))
    val base = IncrementalTopK.readBase(spark, root).get
      .select("id", "key", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(base == live.toSet) // no resurrected id 1, no duplicate id 2
  }

  test("streaming maintainer over MemoryStream equals the batch view") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("inc-topk-stream").toString
    val ckp = Files.createTempDirectory("inc-topk-ckp").toString
    val stream = MemoryStream[Op]
    val df = stream.toDS().toDF("op", "seq", "id", "key_old", "score_old", "key_new", "score_new")
    val q = IncrementalTopK.start(df, root, ckp, K)
    try {
      stream.addData(
        ("i", 9L, 1L, None, None, Some("a"), Some(9.0)),
        ("i", 10L, 2L, None, None, Some("a"), Some(7.0)),
        ("i", 11L, 3L, None, None, Some("a"), Some(5.0)))
      q.processAllAvailable()
      stream.addData(("d", 12L, 1L, Some("a"), Some(9.0), None, None))
      q.processAllAvailable()
      // delete of the leader promoted the runner-up pair
      assert(viewRows(root) == Set(("a", 2L, 7.0), ("a", 3L, 5.0)))
      assert(viewRows(root) == expected(Seq((2L, "a", 7.0), (3L, "a", 5.0))))
    } finally q.stop()
  }
}
