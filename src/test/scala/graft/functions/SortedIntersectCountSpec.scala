package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SortedIntersectCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("sorted-intersect-count-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cnt(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def vecs = {
    import spark.implicits._
    Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 6L, 7L, 9L)), // {3,7} -> 2
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), //              disjoint -> 0
      (Seq.empty[Long], Seq(1L, 2L)), //                  empty side -> 0
      (Seq(-5L, 0L, 4L), Seq(-5L, 0L, 4L)), //            identical -> 3
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue, 0L, Long.MaxValue)),
    ).toDF("a", "b")
  }
  private val expect = Seq(2L, 0L, 0L, 3L, 2L)

  test("matches size(array_intersect(...)) on set-valued sorted arrays") {
    val nat = vecs.select(cnt(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    val builtin = vecs.select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(nat === expect)
    assert(nat === builtin)
  }

  test("codegen and interpreted eval agree; SQL registration works") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(vecs.select(cnt(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(vecs.select(cnt(col("a"), col("b"))).collect()
        .map(_.getLong(0)).toSeq === expect)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(vecs.selectExpr("sorted_intersect_count(a, b)").collect()
      .map(_.getLong(0)).toSeq === expect)
  }

  test("null array yields null; duplicate elements merge as sorted bags " +
      "(min multiplicity), per the documented contract") {
    import spark.implicits._
    val withNull = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(cnt(col("a"), col("b"))).collect()(0).isNullAt(0))
    val bags = Seq((Seq(1L, 1L, 1L, 2L), Seq(1L, 1L, 3L))).toDF("a", "b")
    assert(bags.select(cnt(col("a"), col("b"))).collect()(0).getLong(0) == 2L)
  }
}
