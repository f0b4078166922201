package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental view maintenance: the delta-maintained grouped aggregate
  * must equal a from-scratch recompute over the surviving rows after any
  * op sequence — inserts, amount updates, GROUP-MOVING updates, deletes —
  * across micro-batches, and replaying an already-applied batch must be a
  * no-op (exactly-once under foreachBatch crash-replay).
  */
class IncrementalAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-agg-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // op log: (op, id, grp_old, amount_old, grp_new, amount_new)
  private type Op = (String, Long, String, java.lang.Double, String, java.lang.Double)

  /** Reference: apply the op log to a row map, then aggregate exactly. */
  private def expected(ops: Seq[Op]): Map[String, (Long, BigDecimal)] = {
    val rows = scala.collection.mutable.Map.empty[Long, (String, Double)]
    ops.foreach {
      case ("i", id, _, _, g, a) => rows(id) = (g, a)
      case ("u", id, _, _, g, a) => rows(id) = (g, a)
      case ("d", id, _, _, _, _) => rows.remove(id)
      case other => fail(s"bad op $other")
    }
    rows.values.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.size.toLong,
        vs.map(v => BigDecimal(v._2).setScale(10)).sum)
    }
  }

  private def opsDf(ops: Seq[Op]) = {
    import spark.implicits._
    ops.toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
  }

  private def viewOf(root: String): Map[String, (Long, BigDecimal)] =
    IncrementalAgg.read(spark, root).get
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  test("delta maintenance equals recompute across batches with moves and deletes") {
    val root = Files.createTempDirectory("ivm").toString

    // batch 0: 60 inserts over 5 groups
    val b0: Seq[Op] = (0L until 60L).map(id =>
      ("i", id, null, null: java.lang.Double, s"g${id % 5}",
        java.lang.Double.valueOf(id * 0.25 + 0.125)))
    // batch 1: amount updates (same group), group-moving updates, deletes
    val b1: Seq[Op] =
      (0L until 10L).map(id => ("u", id, s"g${id % 5}",
        java.lang.Double.valueOf(id * 0.25 + 0.125), s"g${id % 5}",
        java.lang.Double.valueOf(1000.5 + id))) ++
      (10L until 20L).map(id => ("u", id, s"g${id % 5}",
        java.lang.Double.valueOf(id * 0.25 + 0.125), s"g${(id + 1) % 5}",
        java.lang.Double.valueOf(id * 0.25 + 0.125))) ++
      (20L until 30L).map(id => ("d", id, s"g${id % 5}",
        java.lang.Double.valueOf(id * 0.25 + 0.125), null, null: java.lang.Double))
    // batch 2: empty a whole group (g4 members: moved/unmoved remnants)
    val b2: Seq[Op] = (0L until 60L)
      .filter(id => id >= 30 && id % 5 == 4)
      .map(id => ("d", id, "g4", java.lang.Double.valueOf(id * 0.25 + 0.125),
        null, null: java.lang.Double))

    IncrementalAgg.merge(opsDf(b0), 0L, root)
    IncrementalAgg.merge(opsDf(b1), 1L, root)
    IncrementalAgg.merge(opsDf(b2), 2L, root)

    val exp = expected(b0 ++ b1 ++ b2)
    assert(viewOf(root) === exp)
    // the emptied group must be DROPPED, not kept at n=0
    assert(!viewOf(root).keySet.exists(g => exp.get(g).exists(_._1 == 0)))
  }

  test("replaying an applied batch is a no-op; streaming run matches batch merges") {
    val root = Files.createTempDirectory("ivm2").toString
    val b0: Seq[Op] = (0L until 20L).map(id =>
      ("i", id, null, null: java.lang.Double, s"g${id % 3}",
        java.lang.Double.valueOf(id + 0.5)))
    val b1: Seq[Op] = (0L until 5L).map(id =>
      ("d", id, s"g${id % 3}", java.lang.Double.valueOf(id + 0.5),
        null, null: java.lang.Double))

    IncrementalAgg.merge(opsDf(b0), 0L, root)
    IncrementalAgg.merge(opsDf(b1), 1L, root)
    val before = viewOf(root)
    IncrementalAgg.merge(opsDf(b1), 1L, root) // crash-replay of batch 1
    IncrementalAgg.merge(opsDf(b0), 0L, root) // stale replay of batch 0
    assert(viewOf(root) === before, "replayed batches must not re-apply")

    // same log through the real streaming path (one file per micro-batch)
    val dir = Files.createTempDirectory("ivmstream")
    val root2 = Files.createTempDirectory("ivm3").toString
    opsDf(b0).write.parquet(s"$dir/f0")
    opsDf(b1).write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(opsDf(b0).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = IncrementalAgg.start(stream, root2,
      Files.createTempDirectory("ivmckp").toString)
    q.processAllAvailable()
    q.stop()
    assert(viewOf(root2) === before)
  }

  test("NULL group merges into ONE row across batches, like batch GROUP BY") {
    val root = Files.createTempDirectory("ivmnull").toString
    def ins(id: Long, grp: String, amt: Double): Op =
      ("i", id, null, null, grp, java.lang.Double.valueOf(amt))
    IncrementalAgg.merge(opsDf(Seq(ins(1, null, 10.0), ins(2, "g1", 1.0))), 0L, root)
    IncrementalAgg.merge(opsDf(Seq(ins(3, null, 5.0))), 1L, root) // NULL group again
    val rows = IncrementalAgg.read(spark, root).get.collect()
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length === 1, s"NULL group split into ${nullRows.length} rows")
    assert(nullRows.head.getLong(1) === 2L)
    assert(BigDecimal(nullRows.head.getDecimal(2)) === BigDecimal(15.0).setScale(10))
    // and a delete cancels it back out through the same single row
    IncrementalAgg.merge(opsDf(Seq(
      ("d", 1L, null, java.lang.Double.valueOf(10.0), null, null),
      ("d", 3L, null, java.lang.Double.valueOf(5.0), null, null))), 2L, root)
    assert(IncrementalAgg.read(spark, root).get.collect().count(_.isNullAt(0)) === 0)
  }

  test("crash between parquet commit and _COMMIT: replay re-merges, no double-apply") {
    val root = Files.createTempDirectory("ivm4").toString
    val b0: Seq[Op] = (0L until 9L).map(id =>
      ("i", id, null, null: java.lang.Double, s"g${id % 3}",
        java.lang.Double.valueOf(1.0)))
    val b1: Seq[Op] = Seq(
      ("i", 100L, null, null: java.lang.Double, "g0", java.lang.Double.valueOf(7.0)))

    IncrementalAgg.merge(opsDf(b0), 0L, root)
    IncrementalAgg.merge(opsDf(b1), 1L, root)
    val after = viewOf(root)

    // simulate the crash window: batch 1's parquet job committed (v dir +
    // _SUCCESS + data) but the process died before the _COMMIT marker —
    // drop v=2's marker, making it a parquet-complete, uncommitted version
    val v2 = new java.io.File(s"$root/v=2/_COMMIT")
    assert(v2.isFile, "expected v=2 to be the batch-1 snapshot")
    assert(v2.delete())

    // the uncommitted version must be invisible to BOTH the reader and the
    // replay guard: lastBatchId falls back to batch 0, and the replayed
    // batch 1 re-merges onto the v=1 base — NOT onto the orphaned v=2
    assert(SnapshotStore.lastBatchId(root) === 0L)
    IncrementalAgg.merge(opsDf(b1), 1L, root) // foreachBatch crash-replay
    assert(viewOf(root) === after, "replay onto the fallback base must reproduce the state")
    assert(viewOf(root)("g0")._1 === 4L, "g0 must count id=100 exactly once")
  }
}
