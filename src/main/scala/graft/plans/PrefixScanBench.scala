package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the distributed prefix scan against the unpartitioned
  * running window it replaces, on events at `SPARK_GRAFT_SF_DIR`
  * (median of 3 warm runs each; e31's running-high-watermark shape).
  * Run: `sbt "runMain graft.plans.PrefixScanBench"`.
  *
  * The win to look for is not wall-clock at test SF — at 600k rows one
  * task sorting the whole input is fast — it is the PLAN: the window
  * form is a single-task sort of the corpus (the 100 TB cliff), the
  * scan form spreads the same work over every core and its only
  * corpus-sized exchange is the bucket shuffle. The printed numbers
  * keep the decision measured rather than assumed. */
object PrefixScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", unix_micros($"ts").as("tus"),
        ($"event_id" +
          conv(substring(md5($"event_id".cast("string")), 1, 2), 16, 10)
            .cast("long") % 64).as("ak"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count() // materialize

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      f // warm
      Seq(time(f), time(f), time(f)).sorted.apply(1)
    }

    val windowForm = median3 {
      val w = Window.orderBy($"ak", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("wm", max($"tus").over(w))
        .write.format("noop").mode("overwrite").save()
    }
    val scanForm = median3 {
      PrefixScan.runningMax(ev, Seq($"ak", $"event_id"), $"tus", "wm")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"window_sec":$windowForm%.3f,"scan_sec":$scanForm%.3f,"speedup":${windowForm / scanForm}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
