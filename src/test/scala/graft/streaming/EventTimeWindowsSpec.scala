package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** T10: watermarked event-time windows — append-mode finality and
  * late-data-drop semantics, driven through MemoryStream micro-batches. */
class EventTimeWindowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("event-time-windows-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // (seconds-since-epoch, event_type, value) → (ts, event_type, value)
  private def eventsDF(stream: MemoryStream[(Long, String, Double)]) = {
    stream.toDS().toDF("sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("user_id", col("event_type")) // reuse type as key for sessions
  }

  private val H = 3600L

  test("tumbling windows: append emission on watermark pass, late data dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Double)]
    val q = EventTimeWindows.tumbling(eventsDF(stream), "1 hour", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("tumb").start()

    def rows() = spark.sql("SELECT window_start, event_type, n, total_value FROM tumb")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toVector.sortBy(_._1.getTime)

    // batch 1: two events in hour 0, one in hour 1
    stream.addData((10L, "view", 1.0), (20L, "view", 2.0), (H + 1800, "click", 5.0))
    q.processAllAvailable()
    // nothing final yet: watermark after batch1 = 01:30 - 10m = 01:20 — but
    // emission happens in the NEXT batch; hour-0 closes then
    stream.addData((5 * H, "view", 1.0)) // watermark riser
    q.processAllAvailable()
    assert(rows().exists { case (ws, t, n, v) =>
      ws.getTime == 0L && t == "view" && n == 2 && v == 3.0 })

    // late event for the already-final hour-0 window: must be dropped
    stream.addData((30L, "view", 100.0))
    q.processAllAvailable()
    stream.addData((6 * H, "view", 1.0)) // advance further, close hour 1
    q.processAllAvailable()
    val r = rows()
    // hour-0 row unchanged (no duplicate, no updated aggregate)
    assert(r.count { case (ws, t, _, _) => ws.getTime == 0L && t == "view" } == 1)
    assert(r.exists { case (ws, t, n, v) =>
      ws.getTime == 0L && t == "view" && n == 2 && v == 3.0 })
    // hour-1 click window emitted once closed
    assert(r.exists { case (ws, t, n, v) =>
      ws.getTime == H * 1000 && t == "click" && n == 1 && v == 5.0 })
    q.stop()
  }

  test("session windows: gap merge/split with watermark finality") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String, Double)]
    val q = EventTimeWindows.sessions(eventsDF(stream), "30 seconds", "30 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess").start()

    // u1: events at 0s and 10s (one session), then 120s (a new session)
    stream.addData((0L, "u1", 1.0), (10L, "u1", 2.0), (120L, "u1", 4.0))
    q.processAllAvailable()
    stream.addData((1000L, "u2", 0.0)) // watermark riser closes both sessions
    q.processAllAvailable()
    stream.addData((2000L, "u2", 0.0)) // one more batch to flush emission
    q.processAllAvailable()

    val r = spark.sql("SELECT user_id, n_events, session_value, session_start, session_end FROM sess")
      .as[(String, Long, Double, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toVector.filter(_._1 == "u1").sortBy(_._4.getTime)
    assert(r.size == 2)
    assert(r(0)._2 == 2 && r(0)._3 == 3.0) // merged 0s+10s session
    // session end = last event + gap
    assert(r(0)._5.getTime == 40000L)
    assert(r(1)._2 == 1 && r(1)._3 == 4.0)
    q.stop()
  }
}
