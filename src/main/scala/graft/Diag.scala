package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic harness — contents change per investigation. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // probe 1: missing path option
    try {
      spark.read.format("binlog-replay").load().count()
      println("[diag] probe1: NO ERROR (unexpected)")
    } catch { case e: Throwable => println(s"[diag] probe1 missing-path: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    // probe 2: nonexistent file
    try {
      spark.read.format("binlog-replay").option("path", "/nope.jsonl").load().count()
      println("[diag] probe2: NO ERROR (unexpected)")
    } catch { case e: Throwable => println(s"[diag] probe2 bad-path: ${e.getClass.getSimpleName}") }
    // probe 3: pushdown visible in the physical plan
    val df = spark.read.format("binlog-replay").option("path", "fixtures/canal_test.jsonl").load()
      .filter(col("op_type") === "insert").select("seq_no", "op_type", "table_name")
    println("[diag] probe3 plan: " + df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("pushed")).getOrElse("NO pushed= LINE"))
    println("[diag] probe3 rows=" + df.count())
    spark.stop()
  }
}
