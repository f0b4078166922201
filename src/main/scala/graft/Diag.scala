package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[diag] $name: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    time("warmup")(spark.range(1000000).count())
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val tokExpr = regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))
    val shSlice = expr("CASE WHEN size(toks) >= 3 THEN array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', slice(toks, i+1, 3)))) ELSE array() END")
    val toks = docs.select($"doc_id", tokExpr.as("toks")).repartition(32, $"doc_id")
    // E: transform only, no explode
    time("E transform no explode")(
      toks.withColumn("sh", shSlice).select(sum(size($"sh"))).as[Long].collect().head)
    // F: explode tokens directly, no transform
    time("F explode toks only")(toks.select($"doc_id", explode($"toks")).count())
    // G: Scala UDF shingles
    val shUdf = udf((ts: Seq[String]) =>
      if (ts.length < 3) Seq.empty[String]
      else ts.sliding(3).map(_.mkString(" ")).toVector.distinct)
    val g = toks.withColumn("sh", shUdf($"toks")).select($"doc_id", explode($"sh").as("s"))
    time("G udf shingles+explode")(g.count())
    time("G again")(g.count())
    spark.stop()
  }
}
