package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Delete-aware MIN/MAX maintenance: the support-view approach must equal
  * a from-scratch recompute after ANY op sequence — in particular the
  * cases a naive (grp → min) view cannot answer: deleting the current
  * minimum (runner-up surfaces), deleting one of two equal minima (min
  * stays), group-moving updates, and full group deletion. Plus the
  * foreachBatch exactly-once replay contract. */
class IncrementalMinMaxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-minmax-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private type Op = (String, Long, String, java.lang.Double, String, java.lang.Double)

  /** Reference recompute over the surviving rows. */
  private def expected(ops: Seq[Op]): Map[String, (Option[Double], Option[Double], Long, Long)] = {
    val rows = scala.collection.mutable.Map.empty[Long, (String, Option[Double])]
    ops.foreach {
      case ("i", id, _, _, g, a) => rows(id) = (g, Option(a).map(_.doubleValue))
      case ("u", id, _, _, g, a) => rows(id) = (g, Option(a).map(_.doubleValue))
      case ("d", id, _, _, _, _) => rows.remove(id)
      case other => fail(s"bad op $other")
    }
    rows.values.groupBy(_._1).map { case (g, vs) =>
      val nn = vs.flatMap(_._2)
      g -> (if (nn.isEmpty) None else Some(nn.min),
        if (nn.isEmpty) None else Some(nn.max),
        vs.size.toLong, nn.toSet.size.toLong)
    }
  }

  private def opsDf(ops: Seq[Op]) = {
    import spark.implicits._
    ops.toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
  }

  private def viewOf(root: String): Map[String, (Option[Double], Option[Double], Long, Long)] =
    IncrementalMinMax.view(spark, root).get.collect().map { r =>
      r.getString(0) -> (
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3), r.getLong(4))
    }.toMap

  private def ins(id: Long, g: String, a: java.lang.Double): Op =
    ("i", id, null, null, g, a)
  private def del(id: Long, g: String, a: java.lang.Double): Op =
    ("d", id, g, a, null, null)
  private def upd(id: Long, gOld: String, aOld: java.lang.Double,
      gNew: String, aNew: java.lang.Double): Op = ("u", id, gOld, aOld, gNew, aNew)

  test("deleting the minimum surfaces the runner-up; equal minima survive one delete") {
    val root = Files.createTempDirectory("mm1").toString
    val b0 = Seq(
      ins(1, "a", 1.0), ins(2, "a", 1.0), ins(3, "a", 5.0), ins(4, "a", 9.0),
      ins(5, "b", 3.0), ins(6, "b", 7.0))
    IncrementalMinMax.merge(opsDf(b0), 0L, root)
    assert(viewOf(root) === expected(b0))

    // delete ONE of the two 1.0 minima in a — min must remain 1.0
    val b1 = Seq(del(1, "a", 1.0))
    IncrementalMinMax.merge(opsDf(b1), 1L, root)
    assert(viewOf(root) === expected(b0 ++ b1))
    assert(viewOf(root)("a")._1 === Some(1.0))

    // delete the LAST 1.0 — the runner-up 5.0 surfaces
    val b2 = Seq(del(2, "a", 1.0))
    IncrementalMinMax.merge(opsDf(b2), 2L, root)
    assert(viewOf(root)("a")._1 === Some(5.0))
    // and the max side symmetrically
    val b3 = Seq(del(4, "a", 9.0))
    IncrementalMinMax.merge(opsDf(b3), 3L, root)
    assert(viewOf(root)("a")._2 === Some(5.0))
    assert(viewOf(root) === expected(b0 ++ b1 ++ b2 ++ b3))
  }

  test("group-moving updates, NULL values, and full group deletion match recompute") {
    val root = Files.createTempDirectory("mm2").toString
    val b0: Seq[Op] = (0L until 30L).map(id =>
      ins(id, s"g${id % 3}", java.lang.Double.valueOf((id * 7 % 13) + 0.5))) ++
      Seq(ins(100, "g0", null)) // NULL value: counted, not min/max material
    val b1: Seq[Op] =
      (0L until 5L).map(id => upd(id, s"g${id % 3}",
        java.lang.Double.valueOf((id * 7 % 13) + 0.5),
        s"g${(id + 1) % 3}", java.lang.Double.valueOf(200.0 + id))) ++
      (5L until 10L).map(id => del(id, s"g${id % 3}",
        java.lang.Double.valueOf((id * 7 % 13) + 0.5)))
    // empty g2 entirely: after b1, its members are the untouched ids
    // (>= 10, id % 3 == 2) plus the moved ids whose NEW group is g2
    val untouchedG2 = b0.collect {
      case ("i", id, _, _, "g2", a) if id >= 10 => del(id, "g2", a)
    }
    val movedG2 = (0L until 5L).collect {
      case id if (id + 1) % 3 == 2 =>
        del(id, "g2", java.lang.Double.valueOf(200.0 + id))
    }
    val b2: Seq[Op] = untouchedG2 ++ movedG2

    IncrementalMinMax.merge(opsDf(b0), 0L, root)
    IncrementalMinMax.merge(opsDf(b1), 1L, root)
    IncrementalMinMax.merge(opsDf(b2), 2L, root)
    val exp = expected(b0 ++ b1 ++ b2)
    assert(viewOf(root) === exp)
    assert(!viewOf(root).contains("g2"), "emptied group must disappear")
    // NULL-valued row counted in n_rows but not in min/max or n_distinct
    val g0 = viewOf(root)("g0")
    assert(g0._1.nonEmpty && g0._3 > g0._4)
  }

  test("replay is a no-op; streaming run matches batch merges") {
    val root = Files.createTempDirectory("mm3").toString
    val b0: Seq[Op] = (0L until 12L).map(id =>
      ins(id, s"g${id % 2}", java.lang.Double.valueOf(id.toDouble)))
    val b1: Seq[Op] = Seq(del(0, "g0", 0.0), del(1, "g1", 1.0)) // both minima
    IncrementalMinMax.merge(opsDf(b0), 0L, root)
    IncrementalMinMax.merge(opsDf(b1), 1L, root)
    val before = viewOf(root)
    assert(before("g0")._1 === Some(2.0))
    IncrementalMinMax.merge(opsDf(b1), 1L, root) // crash-replay
    IncrementalMinMax.merge(opsDf(b0), 0L, root) // stale replay
    assert(viewOf(root) === before)

    val dir = Files.createTempDirectory("mmstream")
    val root2 = Files.createTempDirectory("mm4").toString
    opsDf(b0).write.parquet(s"$dir/f0")
    opsDf(b1).write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(opsDf(b0).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = IncrementalMinMax.start(stream, root2,
      Files.createTempDirectory("mmckp").toString)
    q.processAllAvailable()
    q.stop()
    assert(viewOf(root2) === before)
  }
}
