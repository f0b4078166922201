package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CharEntropySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("char-entropy-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Naive reference: histogram over code points, -Σ p·log2(p). */
  private def ref(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0.0
    val n = cps.length.toDouble
    cps.groupBy(identity).values.map { g =>
      val p = g.length / n
      -p * (math.log(p) / math.log(2.0))
    }.sum
  }

  test("kernel matches the naive reference on fixed cases") {
    val cases = Seq(
      "", "a", "aa", "ab", "abab", "the quick brown fox",
      "aaaaaaaaaaaaaaaab", "0123456789abcdef",
      "héllo wörld", "日本語のテキスト", "aé水😀b") // incl. surrogate pair
    for (c <- cases) {
      val got = CharEntropy.compute(UTF8String.fromString(c))
      assert(math.abs(got - ref(c)) < 1e-12, s"case '$c': $got vs ${ref(c)}")
    }
    // exact known value: 4 symbols equiprobable => 2 bits
    assert(math.abs(CharEntropy.compute(UTF8String.fromString("abcd")) - 2.0) < 1e-12)
  }

  test("kernel matches the naive reference on seeded random strings") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcdefgh", " etaoinshrdlu", "αβγδε01")
    for (i <- 0 until 200) {
      val alpha = alphabets(i % alphabets.length)
      val s = Seq.fill(rnd.nextInt(300))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = CharEntropy.compute(UTF8String.fromString(s))
      assert(math.abs(got - ref(s)) < 1e-12, s"iter $i")
    }
  }

  test("codegen and interpreted eval agree; null-safe; SQL-registered") {
    import spark.implicits._
    val df = Seq(Some("hello world"), Some(""), None, Some("aaaa"), Some("mixed 123!"))
      .toDF("text")
    // SQL path (extensions-injected function, goes through codegen)
    val viaSql = df.selectExpr("char_entropy(text) AS h").collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    // Column path
    val viaCol = df.select(CharEntropy.charEntropy($"text").as("h")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(viaSql.toSeq === viaCol.toSeq)
    // interpreted eval (direct expression, no codegen)
    val exprs = Seq(Some("hello world"), Some(""), None, Some("aaaa"), Some("mixed 123!"))
    val interp = exprs.map {
      case Some(s) => CharEntropy.compute(UTF8String.fromString(s))
      case None => null
    }
    assert(viaSql.toSeq === interp)
    // null in → null out
    assert(viaSql(2) == null)
  }

  test("filter with char_entropy stays inside WholeStageCodegen") {
    import spark.implicits._
    val df = spark.range(100)
      .select(concat(lit("doc "), $"id", lit(" with some text content here")).as("text"))
      .filter(CharEntropy.charEntropy($"text") > lit(1.0))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.count() === 100L)
  }
}
