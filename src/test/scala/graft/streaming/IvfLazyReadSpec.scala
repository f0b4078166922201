package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DOCUMENTED lazy-read caveat of [[IncrementalIvf.assignments]]
  * (r16 verdict "What's wrong" 4) the way the weak-create spec pins its
  * waiver — the hazard's cost is made concrete instead of living only in
  * a scaladoc sentence:
  *
  *  1. a frame held UNMATERIALIZED across later fold cycles races the
  *     post-publish sweep of its superseded dirs and fails LOUDLY
  *     (missing-path signal) at materialize time — never partial data;
  *  2. with `spark.graft.ivf.eagerAssignments=true` the same hold is
  *     safe: the frame was materialized at read time and still returns
  *     exactly the snapshot that existed when it was taken;
  *  3. the retry matcher [[IncrementalIvf.isMissingPathSignal]] accepts
  *     every shape the race takes across Hadoop FileSystems (bare FNFE,
  *     wrapped FNFE, IOException with a does-not-exist message) and
  *     rejects unrelated IO failures.
  */
class IvfLazyReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ivf-lazy-read-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val cents =
    graft.analytics.Similarity.ivfCentroids(spark, dir).persist()

  private def slices(n: Int): Seq[DataFrame] = {
    val all = emb.orderBy(col("vec_id")).collect()
    all.grouped(math.max(1, all.length / n)).toSeq.map(rows =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), emb.schema))
  }

  private def asSet(df: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select(col("cid"), col("cent_id")).as[(Long, Long)].collect().toSet
  }

  private def fnfShaped(x: Throwable): Boolean = x != null && (
    x.isInstanceOf[java.io.FileNotFoundException] ||
      Option(x.getMessage).exists(m =>
        m.contains("FileNotFound") || m.contains("does not exist") ||
          m.contains("have been updated")) ||
      fnfShaped(x.getCause))

  test("a frame held unmaterialized across fold cycles fails LOUDLY with " +
      "a missing-path signal when its superseded dirs are swept — the " +
      "documented failure shape, never silent partial data") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "2") // fold every merge
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-lazy").toString
      val parts = slices(10)
      parts.take(2).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      // the hazard: resolve the live set now, materialize much later
      val held = IncrementalIvf.assignments(spark, root)
      // enough further merges that every dir `held` references is folded
      // into successors and swept by the post-publish GC
      parts.drop(2).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, (i + 2).toLong, root)
      }
      val thrown = intercept[Throwable] { held.collect() }
      assert(fnfShaped(thrown),
        s"expected a missing-path failure shape, got: $thrown")
      // the store itself is untouched by the failed read: a FRESH read
      // returns the full truth
      assert(asSet(IncrementalIvf.assignments(spark, root)) ==
        asSet(IncrementalIvf.deltas(emb, cents)))
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("eagerAssignments=true makes the same hold safe: the frame " +
      "materializes at read time and survives every later fold/sweep, " +
      "returning exactly the snapshot it was taken from") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "2")
    spark.conf.set(IncrementalIvf.EagerAssignmentsKey, "true")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-eager").toString
      val parts = slices(10)
      parts.take(2).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      val snapshotTruth = parts.take(2)
        .map(b => asSet(IncrementalIvf.deltas(b, cents)))
        .reduce(_ ++ _)
      val held = IncrementalIvf.assignments(spark, root)
      parts.drop(2).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, (i + 2).toLong, root)
      }
      assert(asSet(held) == snapshotTruth,
        "eager frame must return the exact snapshot it was taken from")
    } finally {
      spark.conf.unset(IncrementalIvf.EagerAssignmentsKey)
      spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
    }
  }

  test("isMissingPathSignal matches every sweep-race shape and rejects " +
      "unrelated IO failures") {
    import IncrementalIvf.isMissingPathSignal
    assert(isMissingPathSignal(new java.io.FileNotFoundException("/x/y")))
    assert(isMissingPathSignal(
      new java.io.IOException("Path /x/y does not exist")))
    assert(isMissingPathSignal(
      new java.io.IOException("wrapper",
        new java.io.FileNotFoundException("/x/y"))))
    assert(isMissingPathSignal(
      new java.io.IOException("outer",
        new RuntimeException("mid", new java.io.FileNotFoundException("/z")))))
    assert(!isMissingPathSignal(new java.io.IOException("disk quota exceeded")))
    assert(!isMissingPathSignal(
      new java.io.IOException("permission denied",
        new RuntimeException("still not a missing path"))))
  }
}
