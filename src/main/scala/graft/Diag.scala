package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic harness — contents change per investigation.
  * Current probe: outer interval join null-emission boundary — what is
  * the final watermark, and which unconverted clicks emit? */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val all = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type")
    val n = all.count()
    val ordered = all.orderBy($"ts").collect()
    val dir = java.nio.file.Files.createTempDirectory("evattro")
    val (first, second) = ordered.toSeq.splitAt((n / 2).toInt)
    Seq("0" -> first, "1" -> second).foreach { case (name, rows) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), all.schema)
        .write.parquet(s"$dir/f$name")
    }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val q = graft.streaming.EventTimeWindows.attributionOuter(stream)
      .writeStream.outputMode("append").format("memory").queryName("attro").start()
    q.processAllAvailable()
    val progs = q.recentProgress
    progs.foreach(p => println(s"[diag] batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}"))
    q.stop()
    val maxUs = all.agg(max(unix_micros($"ts"))).head().getLong(0)
    println(s"[diag] maxUs=$maxUs  maxTs=${new java.sql.Timestamp(maxUs/1000)}")
    val clicks = all.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("c_us"))
    val purchases = all.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), unix_micros($"ts").as("p_us"))
    val conv = clicks.join(purchases,
        $"user_id" === $"p_user" && $"p_us" > $"c_us" && $"p_us" <= $"c_us" + lit(7200L*1000000L))
      .select($"user_id", $"click_id").distinct()
      .as[(Long, Long)].collect().toSet
    val nulls = spark.sql("SELECT user_id, click_id FROM attro WHERE purchase_id IS NULL")
      .as[(Long, Long)].collect().toSet
    val unconv = clicks.as[(Long, Long, Long)].collect().filterNot(c => conv((c._1, c._2)))
    val emitted = unconv.filter(c => nulls((c._1, c._2)))
    val missing = unconv.filterNot(c => nulls((c._1, c._2)))
    println(s"[diag] unconverted=${unconv.length} emitted=${emitted.length} missing=${missing.length}")
    if (emitted.nonEmpty) println(s"[diag] emitted c_us max = ${emitted.map(_._3).max}")
    if (missing.nonEmpty) println(s"[diag] missing c_us min = ${missing.map(_._3).min}")
    println(s"[diag] proofCut(old) = ${maxUs - 3600000000L - 7200000000L - 1000000L}")
    spark.stop()
  }
}
