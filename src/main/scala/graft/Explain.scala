package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: `runMain graft.Explain <sfDir> <query>[,<query>]`
  * prints the formatted physical plan and cold/warm wall times for each
  * named query — the feedback loop for shuffle/pushdown/broadcast review.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"========== $name ==========")
      fn(spark, sfDir).explain("formatted")
      def time(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = time(); val warm = time()
      println(f"[$name] cold=$cold%.2fs warm=$warm%.2fs")
    }
    spark.stop()
  }
}
