package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runs one named query N times in a warm
  * session (shared caches pre-built by the first pass) and prints each
  * pass's wall time — the "is THIS invocation slow, or just the shared
  * build?" question ClusterBench answers for clusters, answered for one
  * query with per-pass resolution.
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BenchLog.quietBoundedWindowWarnings()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
