package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class WordNgramsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("word-ngrams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b",        // repeats => distinct matters
      "one two",            // shorter than n=3
      "solo",
      "",
      "x y z x y z x y z").toDF("text")
      .withColumn("toks", split(col("text"), " "))
  }

  test("native expression matches the UDF baseline (distinct and bag)") {
    for (k <- 1 to 4; distinct <- Seq(true, false)) {
      val nat = docs.withColumn("g",
          if (distinct) Shingles.distinctNgrams(k)(col("toks"))
          else Shingles.ngrams(k)(col("toks")))
        .select("g").collect().map(_.getSeq[String](0)).toSeq
      val ud = docs.withColumn("g", Shingles.udfNgrams(k, distinct)(col("toks")))
        .select("g").collect().map(_.getSeq[String](0)).toSeq
      assert(nat === ud, s"k=$k distinct=$distinct")
    }
  }

  test("codegen and interpreted eval agree") {
    val w = WordNgrams(org.apache.spark.sql.graft.ColumnBridge
      .expression(col("toks")), 3, true)
    // interpreted path (eval) via a projection with codegen disabled
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = docs.withColumn("g", Shingles.distinctNgrams(3)(col("toks")))
        .select("g").collect().map(_.getSeq[String](0)).toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = docs.withColumn("g", Shingles.distinctNgrams(3)(col("toks")))
        .select("g").collect().map(_.getSeq[String](0)).toSeq
      assert(interp === gen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("SQL surface via extensions: word_ngrams usable in spark.sql") {
    docs.createOrReplaceTempView("wn_docs")
    val rows = spark.sql(
      "SELECT word_ngrams(toks, 2) AS g2, word_ngrams(toks, 3, true) AS g3d " +
        "FROM wn_docs WHERE text = 'a b a b a b'").collect()
    assert(rows.head.getSeq[String](0) ===
      Seq("a b", "b a", "a b", "b a", "a b"))
    assert(rows.head.getSeq[String](1) === Seq("a b a", "b a b"))
  }

  test("edge cases: short arrays, empty strings, nulls in tokens") {
    import spark.implicits._
    val df = Seq(
      (1, Seq("a")),
      (2, Seq.empty[String]),
      (3, Seq("a", null, "c"))).toDF("id", "toks")
    val out = df.withColumn("g", Shingles.ngrams(2)($"toks"))
      .orderBy("id").select("g").collect().map(_.getSeq[String](0)).toSeq
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq("a ", " c")) // null token renders empty
    // null array => null out
    val nul = df.withColumn("toks", when($"id" === 1, $"toks"))
      .withColumn("g", Shingles.ngrams(2)($"toks"))
      .filter($"id" === 2).select("g").collect()
    assert(nul.head.isNullAt(0))
  }

  test("type errors are clean") {
    val e = intercept[Exception] {
      docs.withColumn("g", Shingles.ngrams(2)(col("text"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("word_ngrams") ||
      e.getMessage.contains("array<string>"), e.getMessage)
  }
}
