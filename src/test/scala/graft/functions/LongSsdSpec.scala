package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LongSsdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("long-ssd-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def longSsd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(LongSsd(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def vecs = {
    import spark.implicits._
    Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(3L, -1L, 2L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L << 20, -(1L << 20)), Seq(1L << 20, 1L << 20)),
      (Seq(5L), Seq(5L))).toDF("a", "b")
  }

  test("matches the composed zip_with difference + long_dot form it replaces") {
    val nat = vecs.select(longSsd(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    val hof = vecs.select {
      val d = zip_with(col("a"), col("b"), (x, y) => x - y)
      ColumnBridge.column(LongDot(ColumnBridge.expression(d), ColumnBridge.expression(d)))
    }.collect().map(_.getLong(0)).toSeq
    assert(nat === hof)
  }

  test("codegen and interpreted eval agree; SQL registration works") {
    val expect = Seq(27L, 150L, 0L, 1L << 42, 0L)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(vecs.select(longSsd(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(vecs.select(longSsd(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(vecs.selectExpr("long_ssd(a, b)").collect().map(_.getLong(0)).toSeq === expect)
  }

  test("null array yields null; self-distance is zero") {
    import spark.implicits._
    val withNull = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(longSsd(col("a"), col("b"))).collect()(0).isNullAt(0))
    assert(vecs.select(longSsd(col("a"), col("a"))).collect()
      .map(_.getLong(0)).forall(_ == 0L))
  }
}
