package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming Lloyd-step maintainer must equal the batch s18 query
  * BIT-FOR-BIT after the whole corpus has arrived — under any batch
  * split, under crash-replay of a batch, and when driven by a real
  * streaming query. The additive-sufficient-statistics argument only
  * holds if assignment is truly stateless, so the spec also checks a
  * prefix view equals the batch recompute over just that prefix. */
class IncrementalKMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-kmeans-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val qv = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), IncrementalKMeans.quantize(col("embedding")).as("q"))
    .persist()

  private lazy val cent = qv.orderBy(col("vec_id")).limit(8)
    .select(col("vec_id").as("cid"), col("q").as("cq"))
    .persist()

  /** Batch reference: one Lloyd step over `rows` the s18 way. */
  private def batchStep(rows: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
    import org.apache.spark.sql.graft.ColumnBridge
    val ssd = ColumnBridge.column(graft.functions.LongSsd(
      ColumnBridge.expression(col("q")), ColumnBridge.expression(col("cq"))))
    val assign = rows.crossJoin(broadcast(cent))
      .withColumn("ssd", ssd)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("ssd"), col("cid"))).as("m"), first(col("q")).as("q"))
      .select(col("m.cid").as("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", floor(col("sv").cast("double") / col("n")).cast("long"))
    val centDims = cent.select(col("cid"), posexplode(col("cq")).as(Seq("pos", "cv")))
    assign.join(broadcast(centDims), Seq("cid", "pos"))
      .groupBy("cid")
      .agg(max(col("n")).as("n_assigned"),
        sum((col("m") - col("cv")) * (col("m") - col("cv"))).as("drift"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def viewOf(root: String): Set[(Long, Long, Long)] =
    IncrementalKMeans.view(spark, root, cent).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed batches equal the batch Lloyd step; prefix equals prefix recompute") {
    val root = Files.createTempDirectory("ikm1").toString
    val b0 = qv.filter(col("vec_id") % 3 === 0)
    val b1 = qv.filter(col("vec_id") % 3 === 1)
    val b2 = qv.filter(col("vec_id") % 3 === 2)
    IncrementalKMeans.merge(b0, cent, 0L, root)
    IncrementalKMeans.merge(b1, cent, 1L, root)
    // prefix view == batch recompute over just the arrived rows
    assert(viewOf(root) === batchStep(qv.filter(col("vec_id") % 3 =!= 2)))
    IncrementalKMeans.merge(b2, cent, 2L, root)
    assert(viewOf(root) === batchStep(qv))
  }

  test("streamed result matches the declared s18 query on the same data") {
    val root = Files.createTempDirectory("ikm2").toString
    IncrementalKMeans.merge(qv.filter(col("vec_id") < 100), cent, 0L, root)
    IncrementalKMeans.merge(qv.filter(col("vec_id") >= 100), cent, 1L, root)
    val got = viewOf(root)
    val declared = graft.SparkEntry.queries("s18_kmeans_step")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === declared)
  }

  test("replay is a no-op; a real streaming query reaches the same view") {
    val root = Files.createTempDirectory("ikm3").toString
    val b0 = qv.filter(col("vec_id") % 2 === 0)
    val b1 = qv.filter(col("vec_id") % 2 === 1)
    IncrementalKMeans.merge(b0, cent, 0L, root)
    IncrementalKMeans.merge(b1, cent, 1L, root)
    val before = viewOf(root)
    IncrementalKMeans.merge(b1, cent, 1L, root) // crash-replay
    IncrementalKMeans.merge(b0, cent, 0L, root) // stale replay
    assert(viewOf(root) === before)

    val dir = Files.createTempDirectory("ikmstream")
    val root2 = Files.createTempDirectory("ikm4").toString
    b0.write.parquet(s"$dir/f0")
    b1.write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(qv.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = IncrementalKMeans.start(stream, cent, root2,
      Files.createTempDirectory("ikmckp").toString)
    q.processAllAvailable()
    q.stop()
    assert(viewOf(root2) === before)
    assert(before === batchStep(qv))
  }
}
