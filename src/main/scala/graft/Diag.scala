package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic harness — contents change per investigation.
  * Current probe: stage timing of s14_ivfpq_recall at sf0.1 — where do
  * the ~4.2s go? Runs the full query once (warm), then again (so shared
  * caches are hot), then separates the encode-side cost by running the
  * query a third time with spark.ui timing via stage boundaries proxied
  * through noop writes of intermediate-equivalent frames. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val run = SparkEntry.queries("s14_ivfpq_recall")
    time("s14 cold")(run(spark, dir).write.format("noop").mode("overwrite").save())
    time("s14 warm1")(run(spark, dir).write.format("noop").mode("overwrite").save())
    time("s14 warm2")(run(spark, dir).write.format("noop").mode("overwrite").save())
    // s13 for comparison (shares no ivf build)
    val run13 = SparkEntry.queries("s13_pq_adc_recall")
    time("s13 cold")(run13(spark, dir).write.format("noop").mode("overwrite").save())
    time("s13 warm")(run13(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
