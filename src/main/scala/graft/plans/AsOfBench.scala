package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the native as-of join against the union+window composition it
  * replaces (e10's shape), purchases×views on events at
  * `SPARK_GRAFT_SF_DIR` (median of 3 warm runs each).
  * Run: `sbt "runMain graft.plans.AsOfBench"`. */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("us", expr("ts div 1000"))
      .select("event_id", "user_id", "event_type", "us")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    events.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = { f; Seq(time(f), time(f), time(f)).sorted.apply(1) }

    val windowForm = median3 {
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"tag", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      events.filter($"event_type".isin("view", "purchase"))
        .withColumn("tag", when($"event_type" === "view", 0).otherwise(1))
        .withColumn("view_us",
          last(when($"event_type" === "view", $"us"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"us", $"view_us")
        .write.format("noop").mode("overwrite").save()
    }
    val native = median3 {
      val purchases = events.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"us")
      val views = events.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), $"us".as("view_us"))
      AsOf.join(purchases, views, "user_id", "v_user", "us", "view_us")
        .select($"user_id", $"event_id", $"us", $"view_us")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"""{"window_sec":$windowForm%.3f,"asof_sec":$native%.3f,"speedup":${windowForm / native}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
