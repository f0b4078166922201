package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark-driven late-data handling
  * (SURVEY.md §2.8 T10 — absent in the reference, where time is binlog
  * order; added here for the analytics layer over the emitted change
  * stream). These are the streaming twins of the batch queries in
  * `graft.analytics.Events` (e01 hourly stats, e02 sessionization).
  *
  * Scale notes: state is keyed by (window, group) — bounded by the
  * watermark horizon, evicted as the watermark passes; the shuffle is on
  * the same (window, key) the batch twin uses. At 100 TB the knobs are the
  * watermark delay (state size) and `spark.sql.shuffle.partitions` — the
  * operator shape needs no change.
  */
object EventTimeWindows {

  /** Tumbling event-time windows over an event stream with columns
    * (ts: timestamp, event_type: string, value: double). Append-mode
    * emission: a window row is final — emitted exactly once, when the
    * watermark passes its end; events arriving later than `watermark`
    * behind the max seen event time are dropped, not re-aggregated. */
  def tumbling(
      events: DataFrame,
      duration: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based session windows per user: the streaming twin of the batch
    * lag()-based sessionization (e02). Sessions merge while events arrive
    * within `gap` of each other; a session is emitted once the watermark
    * passes its close. */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Stream-stream INTERVAL join: click→purchase attribution within
    * `within`, the streaming twin of the batch e13. Both sides carry a
    * watermark and the join condition bounds event time on both ends, so
    * Spark evicts a click's state exactly when the watermark proves no
    * future purchase can match (p_ts ≤ c_ts + within < watermark) — state
    * is bounded by (watermark + within) of stream history per key, the
    * 100 TB knob. Inner join in append mode: a pair is emitted once, when
    * both sides have arrived. */
  def attribution(
      events: DataFrame,
      within: String = "2 hours",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
      expr(s"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval $within"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Stream-stream LEFT OUTER interval join — [[attribution]] plus the
    * UNCONVERTED tail: a click with no in-window purchase is emitted with
    * null purchase columns, and Spark emits that null row exactly when
    * the watermark proves no matching purchase can still arrive
    * (c_ts + within < watermark) — the state-eviction point doubles as
    * the no-match decision point, which is why outer interval joins
    * REQUIRE the watermark + both-ends time bound. Same bounded-state
    * story as the inner form; the batch twin is e22's left join (the
    * all-pairs layer under its first-touch pick). */
  def attributionOuter(
      events: DataFrame,
      within: String = "2 hours",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
      expr(s"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval $within"),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Running per-minute event counts — the streaming half of the e14
    * anomaly detector. A plain streaming aggregation: the state store
    * keeps one count per minute and each micro-batch merges into it,
    * which is exactly why e14's moment triple works incrementally (counts
    * are mergeable; the moments derive from the counts). Complete/update
    * mode (no watermark): anomaly detection wants the stats over ALL
    * minutes seen so far, not only un-final ones. */
  def minutelyRate(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("minute_us"), col("n"))

  /** z-score anomalies over a (minute_us, n) rate table: the EXACT dag of
    * the batch e14 (`analytics/Events.scala`) — integer moment sums, then
    * a fixed double expression — so streamed counts produce bit-identical
    * anomalies to a batch over the same data (EventsStreamParitySpec). */
  def rateAnomalies(perMinute: DataFrame): DataFrame = {
    val stats = perMinute.agg(
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("sq"),
      count(lit(1)).as("cnt"))
    perMinute.crossJoin(broadcast(stats))
      .withColumn("mean", col("s").cast("double") / col("cnt"))
      .withColumn("z",
        (col("n") - col("mean")) /
          sqrt(col("sq").cast("double") / col("cnt") - col("mean") * col("mean")))
      .filter(abs(col("z")) > 2.0)
      .select(col("minute_us"), col("n"), col("z"))
      .orderBy(col("minute_us"))
  }
}
