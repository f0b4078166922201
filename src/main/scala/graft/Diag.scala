package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic harness — contents change per investigation.
  * Current probe: where does s15_hybrid_rrf's sf0.1 time go? */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.t(spark, dir, "documents")
    time("warm docs")(docs.count())
    def toksCol = regexp_extract_all(lower($"text"), lit("[a-z0-9']+"), lit(0))
    val cand = docs.filter($"doc_id" >= 1)
      .select($"doc_id", toksCol.as("w")).withColumn("dl", size($"w").cast("long"))
    time("tokenize+dl agg")(cand.agg(count(lit(1)), sum($"dl")).collect())
    val qterms = docs.filter($"doc_id" === 0)
      .select(explode(array_distinct(toksCol)).as("term"))
    time("qterms")(println("  nterms=" + qterms.count()))
    val tf = cand.select($"doc_id", $"dl", explode($"w").as("term"))
      .join(broadcast(qterms), "term")
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    time("tf agg")(println("  tfrows=" + tf.count()))
    time("tf agg again (recompute)")(tf.count())
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val emb = Tables.t(spark, dir, "embeddings")
    time("warm emb")(emb.count())
    time("vec cosine scan") {
      val q = emb.withColumn("q", transform($"embedding", x => round(x.cast("double") * (1L << 20)).cast("long")))
      import org.apache.spark.sql.graft.ColumnBridge
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        ColumnBridge.column(graft.functions.LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
      val withN = q.withColumn("n2", dot($"q", $"q"))
      val qv = withN.filter($"vec_id" === 0).select($"q".as("qa"), $"n2".as("n2a"))
      val top = withN.filter($"vec_id" >= 1).crossJoin(broadcast(qv))
        .withColumn("cos", dot($"qa", $"q").cast("double") / sqrt($"n2a".cast("double") * $"n2".cast("double")))
        .orderBy($"cos".desc, $"vec_id").limit(50)
      println("  vecrows=" + top.count())
    }
    spark.stop()
  }
}
