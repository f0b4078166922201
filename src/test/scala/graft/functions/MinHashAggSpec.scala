package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The typed MinHash aggregator: lane-exact parity with the
  * 16-min-expressions form (including Long-wrap on ha + h·hb), correct
  * partial/merge behavior across partitions, and SQL registration. */
class MinHashAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("minhash-agg-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("matches the 16-min-expressions form across partitions, SQL-callable") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 52-bit non-negative hashes — the md5-half domain the real pipeline
    // feeds (d03/d14): ha + 15·hb < 2^56, no ANSI overflow either side
    val rows = (0 until 2000).map { i =>
      (i % 17L, rnd.nextLong(1L << 52), rnd.nextLong(1L << 52))
    }
    val df = rows.toDF("g", "ha", "hb").repartition(7) // force partial+merge
    val agg = df.groupBy($"g")
      .agg(MinHashAgg.minhash16($"ha", $"hb").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    val mins = (0 until 16).map(h => min($"ha" + lit(h.toLong) * $"hb").as(s"mh$h"))
    val expr16 = df.groupBy($"g").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getLong(_)).toVector).toMap
    assert(agg.nonEmpty && agg === expr16)

    MinHashAgg.register(spark)
    df.createOrReplaceTempView("pairs")
    val viaSql = spark.sql(
      "SELECT g, minhash16(ha, hb) AS sig FROM pairs GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaSql === expr16)
  }
}
