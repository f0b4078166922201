package graft
import org.apache.spark.sql.SparkSession

/** Round-7 reproduction harness for the BENCH_r06 q05–q10 cluster question:
  * the official round-6 artifact shows q05/q07/q08/q09/q10 at 2.3–2.9× their
  * round-5 medians, while the SAME round's committed refresh (d79c368) has
  * them at round-5 levels with zero source change in between. This main runs
  * the suspect queries interleaved, median-of-3, TWICE back-to-back in one
  * session (the judge-prescribed protocol), plus two control queries that
  * were flat across the two artifacts (q01, q03) — if the controls double
  * alongside the cluster, the effect is whole-session box noise, not a
  * query-specific regression.
  */
object ClusterBench {
  // SPARK_GRAFT_CLUSTER overrides the suspect list (comma-separated query
  // names) so any future round's "did these really regress?" question runs
  // the same two-pass interleaved protocol without editing this file.
  private val Cluster = sys.env.get("SPARK_GRAFT_CLUSTER")
    .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(Seq("q05_regional_revenue", "q06_revenue_forecast",
      "q07_volume_shipping", "q08_market_share", "q09_nation_year_revenue",
      "q10_returned_items"))
  private val Controls = Seq("q01_pricing_summary", "q03_shipping_priority")

  def main(args: Array[String]): Unit = {
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { name =>
      try Tables.t(spark, sfDir, name).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val names = Cluster ++ Controls
    // Fail loudly on a typo'd SPARK_GRAFT_CLUSTER entry: a silently-skipped
    // suspect would make the adjudication look green by omission.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    def pass(): Map[String, Double] = {
      val samples = collection.mutable.LinkedHashMap.empty[String, List[Double]]
      for (_ <- 1 to 3; name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        samples.updateWith(name)(prev => Some(dt :: prev.getOrElse(Nil)))
      }
      samples.map { case (n, ts) => n -> ts.sorted.apply(ts.size / 2) }.toMap
    }
    val a = pass()
    val b = pass()
    def fmt(m: Map[String, Double]): String =
      names.map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
    val out = s"""{"passA":${fmt(a)},"passB":${fmt(b)},"sf":"$sfDir","head":"${Bench.gitHead()}","method":"interleaved median-of-3, two back-to-back passes in one session; controls q01/q03${Bench.benchNote()}"}"""
    val path = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_OUT", "/tmp/cluster_bench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
