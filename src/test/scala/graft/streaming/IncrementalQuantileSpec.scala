package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming quantile-sketch maintainer must equal the batch q48
  * query BIT-FOR-BIT after the whole table has arrived — under any batch
  * split and under crash-replay — and a prefix view must equal the batch
  * math over just the arrived rows (mergeability is exactly this). */
class IncrementalQuantileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-quantile-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("value"),
      col("l_orderkey"))
    .persist()

  private type Row6 = (String, Long, Int, Long, Long, Long)

  private def viewOf(root: String): Set[Row6] =
    IncrementalQuantile.view(spark, root).get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  /** Batch reference: the q48 math over `rows`, via one state merge. */
  private def batchRef(rows: org.apache.spark.sql.DataFrame): Set[Row6] = {
    val root = Files.createTempDirectory("iqref").toString
    IncrementalQuantile.merge(rows, 0L, root)
    viewOf(root)
  }

  test("streamed batches equal batch q48 on the same rows; prefix equals prefix") {
    val root = Files.createTempDirectory("iq1").toString
    val b0 = li.filter(col("l_orderkey") % 3 === 0)
    val b1 = li.filter(col("l_orderkey") % 3 === 1)
    val b2 = li.filter(col("l_orderkey") % 3 === 2)
    IncrementalQuantile.merge(b0, 0L, root)
    IncrementalQuantile.merge(b1, 1L, root)
    assert(viewOf(root) === batchRef(li.filter(col("l_orderkey") % 3 =!= 2)))
    IncrementalQuantile.merge(b2, 2L, root)
    assert(viewOf(root) === batchRef(li))
  }

  test("final view matches the declared q48 query output") {
    val root = Files.createTempDirectory("iq2").toString
    IncrementalQuantile.merge(li.filter(col("l_orderkey") % 2 === 0), 0L, root)
    IncrementalQuantile.merge(li.filter(col("l_orderkey") % 2 === 1), 1L, root)
    val got = viewOf(root)
    val declared = graft.SparkEntry.queries("q48_quantile_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === declared)
  }

  test("replay is a no-op; a real streaming query reaches the same view") {
    val root = Files.createTempDirectory("iq3").toString
    val b0 = li.filter(col("l_orderkey") % 2 === 0)
    val b1 = li.filter(col("l_orderkey") % 2 === 1)
    IncrementalQuantile.merge(b0, 0L, root)
    IncrementalQuantile.merge(b1, 1L, root)
    val before = viewOf(root)
    IncrementalQuantile.merge(b1, 1L, root) // crash-replay
    IncrementalQuantile.merge(b0, 0L, root) // stale replay
    assert(viewOf(root) === before)

    val dir = Files.createTempDirectory("iqstream")
    val root2 = Files.createTempDirectory("iq4").toString
    b0.write.parquet(s"$dir/f0")
    b1.write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = IncrementalQuantile.start(stream, root2,
      Files.createTempDirectory("iqckp").toString)
    q.processAllAvailable()
    q.stop()
    assert(viewOf(root2) === before)
  }
}
