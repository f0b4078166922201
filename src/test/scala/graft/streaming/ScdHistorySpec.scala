package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SCD Type-2 maintenance: the incrementally maintained history must equal
  * the batch lead()-closure recompute (the c05 shape) after ANY batch
  * split of an ordered change log — including keys updated several times
  * inside one batch, keys spanning batches, and never-touched-again keys
  * — with exactly one open row per key, contiguous intervals, and
  * exactly-once replay. */
class ScdHistorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("scd-history-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // change log: (user_id, event_id, us, value)
  private type Chg = (Long, Long, Long, Double)

  private def chgDf(cs: Seq[Chg]) = {
    import spark.implicits._
    cs.toDF("user_id", "event_id", "us", "value")
  }

  /** Batch recompute — the c05 lead() closure over the full log. */
  private def expected(cs: Seq[Chg]): Set[(Long, Long, Double, Long, Option[Long], Boolean)] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    import spark.implicits._
    chgDf(cs)
      .select(col("user_id"), col("event_id"), col("value"),
        col("us").as("valid_from_us"), lead(col("us"), 1).over(w).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().toSet
  }

  private def viewOf(root: String): Set[(Long, Long, Double, Long, Option[Long], Boolean)] = {
    import spark.implicits._
    ScdHistory.read(spark, root).get
      .select("user_id", "event_id", "value", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().toSet
  }

  // an ordered per-key log: user u's k-th change at us = 1000*u + 10*k
  private def log(users: Int, perUser: Int): Seq[Chg] =
    (for (u <- 0 until users; k <- 0 until perUser)
      yield (u.toLong, (u * 100 + k).toLong, 1000L * u + 10L * k, u + k * 0.5))
      .sortBy(_._3) // global timestamp order, keys interleaved

  test("maintained history equals the batch lead() closure for any batch split") {
    val full = log(users = 7, perUser = 5)
    for (splits <- Seq(Seq(35), Seq(10, 35), Seq(1, 2, 20, 35), Seq(5, 10, 15, 20, 25, 30, 35))) {
      val root = Files.createTempDirectory("scd").toString
      var from = 0
      splits.zipWithIndex.foreach { case (to, i) =>
        ScdHistory.merge(chgDf(full.slice(from, to)), i.toLong, root)
        from = to
      }
      val got = viewOf(root)
      assert(got === expected(full), s"mismatch for split $splits")
      // invariants: one open row per key, intervals contiguous per key
      val byKey = got.groupBy(_._1)
      byKey.foreach { case (u, rows) =>
        assert(rows.count(_._6) === 1, s"user $u open-row count != 1")
        val sorted = rows.toSeq.sortBy(_._4)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._5.contains(b._4),
            s"user $u: version ending ${a._5} not contiguous with ${b._4}")
          case _ => ()
        }
      }
    }
  }

  test("replay is a no-op; streaming run matches batch merges") {
    val full = log(users = 4, perUser = 4)
    val (b0, b1) = full.splitAt(9)
    val root = Files.createTempDirectory("scd2").toString
    ScdHistory.merge(chgDf(b0), 0L, root)
    ScdHistory.merge(chgDf(b1), 1L, root)
    val before = viewOf(root)
    ScdHistory.merge(chgDf(b1), 1L, root) // crash replay
    ScdHistory.merge(chgDf(b0), 0L, root) // stale replay
    assert(viewOf(root) === before)
    assert(before === expected(full))

    val dir = Files.createTempDirectory("scdstream")
    val root2 = Files.createTempDirectory("scd3").toString
    // ONE file per micro-batch: SCD closure is order-SENSITIVE (unlike the
    // commutative delta merges), and the file source feeds part-files of
    // one logical batch in arbitrary listing order
    chgDf(b0).coalesce(1).write.parquet(s"$dir/f0")
    chgDf(b1).coalesce(1).write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(chgDf(b0).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = ScdHistory.start(stream, root2,
      Files.createTempDirectory("scdckp").toString)
    q.processAllAvailable()
    q.stop()
    assert(viewOf(root2) === before)
  }
}
