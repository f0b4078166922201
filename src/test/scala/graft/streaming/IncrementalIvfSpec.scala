package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** IncrementalIvf: the frozen-quantizer assignment index maintained over
  * micro-batches equals the batch assignment of the same rows, under any
  * batch split, with replay a no-op; the live balance view equals the
  * s20 computation over the arrived set. */
class IncrementalIvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-ivf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  // the frozen quantizer: the session-cached batch build's refined
  // centroids — what production pins between re-trains
  private lazy val cents =
    graft.analytics.Similarity.ivfCentroids(spark, dir).persist()

  private def batchAssign(rows: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    IncrementalIvf.deltas(rows, cents).as[(Long, Long)].collect().toSet
  }

  private def arrivedSlices(n: Int): Seq[DataFrame] = {
    val all = emb.orderBy(col("vec_id")).collect()
    all.grouped(math.max(1, all.length / n)).toSeq.map(rows =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), emb.schema))
  }

  test("maintained assignments == batch assignment under a 3-way split; " +
      "replay is a no-op; balance view == s20 math over the arrived set") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf-state").toString
    val slices = arrivedSlices(3)
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalIvf.merge(b, cents, i.toLong, root)
    }
    // replayed batch (crash between commit and ack): state unchanged
    val before = IncrementalIvf.assignments(spark, root).count()
    IncrementalIvf.merge(slices(1), cents, 1L, root)
    assert(IncrementalIvf.assignments(spark, root).count() == before)

    val maintained = IncrementalIvf.assignments(spark, root)
      .select(col("cid"), col("cent_id")).as[(Long, Long)].collect().toSet
    assert(maintained == batchAssign(emb), "assignment parity broken")

    // balance view parity: same formula over the maintained counts
    val view = IncrementalIvf.balanceView(spark, root)
      .as[(Long, Long, Long)].collect().toSeq
    val counts = maintained.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val expect = counts.toSeq.sorted.map { case (c, n) =>
      (c, n, n * counts.size * 1000000L / total)
    }
    assert(view == expect)
    assert(view.map(_._2).sum == emb.count())
  }

  test("real streaming query over micro-batches == one-shot batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val ckp = java.nio.file.Files.createTempDirectory("ivf-ckp").toString
    val rows = emb.as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = IncrementalIvf.start(
      stream.toDS().toDF("vec_id", "embedding"), cents, root, ckp)
    val (h, t) = rows.splitAt(rows.size / 2)
    stream.addData(h)
    q.processAllAvailable()
    stream.addData(t)
    q.processAllAvailable()
    q.stop()
    val maintained = IncrementalIvf.assignments(spark, root)
      .select(col("cid"), col("cent_id")).as[(Long, Long)].collect().toSet
    assert(maintained == batchAssign(emb))
  }
}
