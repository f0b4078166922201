package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LongDotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("long-dot-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def longDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def vecs = {
    import spark.implicits._
    Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(3L, -1L, 2L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L << 20, -(1L << 20)), Seq(1L << 20, 1L << 20)),
      (Seq(5L), Seq(5L))).toDF("a", "b")
  }

  test("matches the aggregate(zip_with) higher-order form") {
    val nat = vecs.select(longDot(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    val hof = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .collect().map(_.getLong(0)).toSeq
    assert(nat === hof)
  }

  test("codegen and interpreted eval agree") {
    val expect = Seq(32L, -3L, 0L, 0L, 25L)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(vecs.select(longDot(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(vecs.select(longDot(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null array yields null; self-dot is the squared norm") {
    import spark.implicits._
    val withNull = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    val row = withNull.select(longDot(col("a"), col("b"))).collect()(0)
    assert(row.isNullAt(0))
    val n2 = vecs.select(longDot(col("a"), col("a"))).collect().map(_.getLong(0)).toSeq
    assert(n2 === Seq(14L, 130L, 0L, 2L * (1L << 40), 25L))
  }

  test("registered in SQL via GraftExtensions") {
    vecs.createOrReplaceTempView("ldvecs")
    val got = spark.sql("SELECT long_dot(a, b) FROM ldvecs")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(32L, -3L, 0L, 0L, 25L))
  }
}
