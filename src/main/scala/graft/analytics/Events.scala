package graft.analytics

import graft.GraftSession.MaterializeOps
import graft.{QueryDef, Tables}
import graft.sqlx._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table.
  *
  * These are the batch twins of the streaming semantics the CDC reference
  * needs (SURVEY.md §2.8): event-time windowing (T10 — absent in the
  * reference, added here), sessionization by gap (the delimiter-based
  * grouping of sink/kafka/kafka.go:294-336 generalized to time gaps),
  * stateful dedup (canal/handler_mux.go:81-103 F3 semantics), and
  * ordered per-key state replay (the current-state MERGE pattern).
  *
  * All time arithmetic is done on exact epoch-microsecond longs
  * (unix_micros / epoch_us) so Spark and the DuckDB oracle agree bit-for-bit.
  * Scale: everything partitions by user_id (or the window bucket) — no
  * global sort, no driver-side state; at 100 TB these are plain shuffles
  * on high-cardinality keys.
  */
object Events {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    // ---- e01: hourly tumbling-window aggregation ----
    QueryDef(
      "e01_hourly_window_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd").as("day"),
            hour($"ts").as("hr"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"),
            min($"value").as("min_value"), max($"value").as("max_value"))
          .orderBy($"day", $"hr", $"event_type")
      },
      Some(s"""
        SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d') AS day,
               CAST(HOUR(ts) AS INT) AS hr, event_type,
               COUNT(*) AS n, ${SUM("value")} AS total_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY 1, 2, 3 ORDER BY day, hr, event_type"""),
    ),

    // ---- e02: gap-based sessionization (30-min inactivity gap) ----
    QueryDef(
      "e02_sessionization",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val gapUs = 30L * 60 * 1000 * 1000
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("prev_us", lag($"us", 1).over(w))
          .withColumn("new_session",
            when($"prev_us".isNull || $"us" - $"prev_us" > gapUs, 1L).otherwise(0L))
          .withColumn("session_id", sum($"new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"), min($"us").as("start_us"),
            max($"us").as("end_us"), dsum($"value").as("session_value"))
          .withColumn("duration_us", $"end_us" - $"start_us")
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(us) AS start_us, MAX(us) AS end_us,
               ${SUM("value")} AS session_value,
               MAX(us) - MIN(us) AS duration_us
        FROM (
          SELECT user_id, value, us,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM (
            SELECT user_id, event_id, value, epoch_us(ts) AS us,
                   CASE WHEN LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events) g) x
        GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
    ),

    // ---- e03: conversion funnel view → purchase within 7 days ----
    QueryDef(
      "e03_funnel_conversion",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        val firstView = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("t0"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"us".as("pt"))
        firstView
          .join(purchases,
            $"user_id" === $"p_user" && $"pt" > $"t0" && $"pt" <= $"t0" + lit(604800000000L),
            "left_semi")
          .agg(count(lit(1)).as("converted_users"))
      },
      Some("""
        SELECT COUNT(*) AS converted_users FROM (
          SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
          WHERE event_type = 'view' GROUP BY user_id) v
        WHERE EXISTS (
          SELECT 1 FROM events p
          WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
            AND epoch_us(p.ts) > v.t0 AND epoch_us(p.ts) <= v.t0 + 604800000000)"""),
    ),

    // ---- e04: per-user event-type pivot (conditional aggregation) ----
    QueryDef(
      "e04_user_type_pivot",
      (s, dir) => {
        import s.implicits._
        def cnt(tpe: String) = sum(when($"event_type" === tpe, 1L).otherwise(0L))
        t(s, dir, "events")
          .groupBy($"user_id")
          .agg(cnt("view").as("n_view"), cnt("click").as("n_click"),
            cnt("signup").as("n_signup"), cnt("purchase").as("n_purchase"),
            cnt("error").as("n_error"), dsum($"value").as("total_value"))
          .orderBy($"user_id")
      },
      Some(s"""
        SELECT user_id,
          CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
          CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
          CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
          CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
          CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
          ${SUM("value")} AS total_value
        FROM events GROUP BY user_id ORDER BY user_id"""),
    ),

    // ---- e05: top users by exact total value (rank on exact decimal) ----
    QueryDef(
      "e05_top_users",
      (s, dir) => {
        import s.implicits._
        val agg = t(s, dir, "events").groupBy($"user_id")
          .agg(dsumExact($"value").as("v_exact"), count(lit(1)).as("n_events"))
        // top-20 via orderBy+limit (TakeOrderedAndProject: per-partition
        // heaps, NO global sort of the per-user aggregate — an
        // unpartitioned rank window here would funnel every user through
        // one task); row_number then runs over the 20 survivors only
        val top = agg.orderBy($"v_exact".desc, $"user_id").limit(20)
        val w = Window.orderBy($"v_exact".desc, $"user_id")
        top.withColumn("rk", row_number().over(w))
          .select($"rk", $"user_id", dec2dbl($"v_exact").as("total_value"), $"n_events")
          .orderBy($"rk")
      },
      Some("""
        SELECT rk, user_id, CAST(CAST(v_exact AS VARCHAR) AS DOUBLE) AS total_value, n_events FROM (
          SELECT user_id, SUM(CAST(value AS DECIMAL(28,10))) AS v_exact, COUNT(*) AS n_events,
                 ROW_NUMBER() OVER (ORDER BY SUM(CAST(value AS DECIMAL(28,10))) DESC, user_id) AS rk
          FROM events GROUP BY user_id) x
        WHERE rk <= 20 ORDER BY rk"""),
    ),

    // ---- e06: per-user lag/lead (time-since-previous, next type) ----
    QueryDef(
      "e06_inter_event_gaps",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("gap_us", $"us" - lag($"us", 1).over(w))
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"user_id" < 20)
          .select($"user_id", $"event_id", $"event_type", $"gap_us", $"next_type")
          .orderBy($"user_id", $"us", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, event_type,
               epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us,
               LEAD(event_type, 1) OVER w AS next_type
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY user_id, epoch_us(ts), event_id"""),
    ),

    // ---- e07: JSON property extraction (props is a JSON string) ----
    QueryDef(
      "e07_json_props",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .withColumn("k", regexp_extract($"props", "\"k\": ([0-9]+)", 1).cast("long"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
            (sum($"k").cast("double") / count(lit(1))).as("avg_k"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_k
        FROM events GROUP BY event_type ORDER BY event_type"""),
    ),

    // ---- e08: streaming-style dedup — first event per (user, type) ----
    QueryDef(
      "e08_dedup_first_per_key",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type").orderBy($"us", $"event_id")
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"event_id", $"us")
          .orderBy($"user_id", $"event_type")
      },
      Some("""
        SELECT user_id, event_type, event_id, us FROM (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_us(ts), event_id) AS rn
          FROM events) x
        WHERE rn = 1 ORDER BY user_id, event_type"""),
    ),

    // ---- e09: per-minute event rate (fine-grained tumbling window) ----
    QueryDef(
      "e09_minutely_rate",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(unix_micros(date_trunc("minute", $"ts")).as("minute_us"))
          .agg(count(lit(1)).as("n"))
          .filter($"n" >= 3)
          .orderBy($"minute_us")
      },
      Some("""
        SELECT epoch_us(DATE_TRUNC('minute', ts)) AS minute_us, COUNT(*) AS n
        FROM events GROUP BY 1 HAVING COUNT(*) >= 3 ORDER BY minute_us"""),
    ),

    // ---- e11: weekly retention cohorts ----
    // Cohort = week of a user's first event; cell = distinct users from
    // that cohort active k weeks later. Two shuffles (per-user min, then
    // cohort×offset distinct count) — the standard shape; at 100 TB the
    // distinct count is the heavy op and would swap to approx_count_distinct.
    QueryDef(
      "e11_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .withColumn("wk", expr("unix_micros(date_trunc('week', ts)) div 604800000000"))
        val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        ev.join(cohort, "user_id")
          .withColumn("offset_wk", $"wk" - $"cohort_wk")
          .groupBy($"cohort_wk", $"offset_wk")
          .agg(countDistinct($"user_id").as("active_users"))
          .orderBy($"cohort_wk", $"offset_wk")
      },
      Some("""
        WITH ev AS (
          SELECT user_id,
                 epoch_us(DATE_TRUNC('week', ts)) // 604800000000 AS wk
          FROM events),
        cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id)
        SELECT c.cohort_wk, e.wk - c.cohort_wk AS offset_wk,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM ev e JOIN cohort c ON c.user_id = e.user_id
        GROUP BY c.cohort_wk, e.wk - c.cohort_wk
        ORDER BY cohort_wk, offset_wk"""),
    ),

    // ---- e12: event-type transition matrix (per-user Markov pairs) ----
    QueryDef(
      "e12_transition_matrix",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type".as("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"prev_type", $"next_type")
      },
      Some("""
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM (
          SELECT user_id, event_type,
                 LAG(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev_type
          FROM events) x
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type, next_type"""),
    ),

    // ---- e10: as-of join (latest view at-or-before each purchase) ----
    // The classic operator Spark lacks natively, composed from built-ins
    // the scalable way: tag both sides, ONE shuffle on the join key, sort
    // within partition, running `last(ignoreNulls)` — never a per-row
    // range probe. At 100 TB this is a single sort-shuffle by user_id
    // (equivalently: a merge of two pre-bucketed streams); the naive
    // correlated-subquery form the oracle uses would be quadratic.
    QueryDef(
      "e10_asof_join",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"us", $"tag", $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, dir, "events")
          .filter($"event_type".isin("view", "purchase"))
          .withColumn("us", unix_micros($"ts"))
          // views sort before purchases at equal timestamps ⇒ "at-or-before"
          .withColumn("tag", when($"event_type" === "view", 0).otherwise(1))
          .withColumn("view_us",
            last(when($"event_type" === "view", $"us"), ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"us".as("purchase_us"), $"view_us",
            ($"us" - $"view_us").as("gap_us"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT e.user_id, e.event_id, epoch_us(e.ts) AS purchase_us,
               (SELECT MAX(epoch_us(v.ts)) FROM events v
                WHERE v.user_id = e.user_id AND v.event_type = 'view'
                  AND epoch_us(v.ts) <= epoch_us(e.ts)) AS view_us,
               epoch_us(e.ts) - (SELECT MAX(epoch_us(v.ts)) FROM events v
                WHERE v.user_id = e.user_id AND v.event_type = 'view'
                  AND epoch_us(v.ts) <= epoch_us(e.ts)) AS gap_us
        FROM events e WHERE e.event_type = 'purchase'
        ORDER BY e.user_id, e.event_id"""),
    ),

    // ---- e13: click→purchase attribution (interval join) ----
    // Every purchase attributed to each click by the same user within the
    // preceding 2 hours — the batch twin of the stream-stream interval
    // join (`streaming/EventTimeWindows.attribution`, parity-tested in
    // EventsStreamParitySpec). The join is an equi-join on user_id with a
    // range residual: at 100 TB both sides shuffle once on user_id and the
    // range filter runs inside the sort-merge — no time-bucket explosion
    // needed until per-user event counts skew (then: bucket ts to coarse
    // windows and join on (user, bucket±1)). Timestamps leave as epoch
    // micros (exact integers in both engines).
    QueryDef(
      "e13_attribution",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("c_us"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
            unix_micros($"ts").as("p_us"))
        clicks.join(purchases,
          $"user_id" === $"p_user" && $"p_us" > $"c_us" &&
            $"p_us" <= $"c_us" + lit(7200L * 1000000L))
          .select($"user_id", $"click_id", $"purchase_id", ($"p_us" - $"c_us").as("gap_us"))
          .orderBy($"user_id", $"click_id", $"purchase_id")
      },
      Some("""
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
               epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND epoch_us(b.ts) > epoch_us(a.ts)
         AND epoch_us(b.ts) <= epoch_us(a.ts) + 7200000000
        ORDER BY a.user_id, click_id, purchase_id"""),
    ),

    // ---- e22: first-touch attribution with the UNCONVERTED tail ----
    // e13 emits every (click, purchase) pair inside the window — the
    // all-pairs interval join. The report a marketing pipeline actually
    // ships is per-CLICK: the earliest in-window purchase (first-touch)
    // or an explicit unconverted row, so conversion RATE is computable
    // from the output alone. The earliest-purchase pick is a sort-free
    // min(struct(p_us, purchase_id)) aggregate over the interval-join
    // pairs (the q48/s13 argmin pattern — no per-key window sort), then
    // ONE left join puts the unconverted tail back. Both shuffles key on
    // (user_id, click_id) — high-cardinality, skew-free. The streaming
    // twin is `EventTimeWindows.attributionOuter`: the same interval
    // condition as a stream-stream LEFT OUTER join, where Spark emits the
    // null rows exactly when the watermark proves no purchase can still
    // arrive (EventsStreamParitySpec locks stream == batch including the
    // unmatched tail).
    QueryDef(
      "e22_first_touch_attribution",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), unix_micros($"ts").as("c_us"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
            unix_micros($"ts").as("p_us"))
        val first = clicks.join(purchases,
            $"user_id" === $"p_user" && $"p_us" > $"c_us" &&
              $"p_us" <= $"c_us" + lit(7200L * 1000000L))
          .groupBy($"user_id", $"click_id")
          .agg(min(struct($"p_us", $"purchase_id")).as("b"))
          .select($"user_id", $"click_id",
            $"b.purchase_id".as("purchase_id"), $"b.p_us".as("p_us"))
        clicks.join(first, Seq("user_id", "click_id"), "left")
          .select($"user_id", $"click_id", $"purchase_id",
            ($"p_us" - $"c_us").as("gap_us"),
            $"purchase_id".isNotNull.as("converted"))
          .orderBy($"user_id", $"click_id")
      },
      Some("""
        WITH clicks AS (
          SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click'),
        first AS (
          SELECT user_id, click_id, purchase_id, p_us FROM (
            SELECT c.user_id, c.click_id, b.event_id AS purchase_id,
                   epoch_us(b.ts) AS p_us,
                   ROW_NUMBER() OVER (PARTITION BY c.user_id, c.click_id
                                      ORDER BY epoch_us(b.ts), b.event_id) AS rn
            FROM clicks c JOIN events b
              ON b.user_id = c.user_id AND b.event_type = 'purchase'
             AND epoch_us(b.ts) > c.c_us
             AND epoch_us(b.ts) <= c.c_us + 7200000000) x
          WHERE rn = 1)
        SELECT c.user_id, c.click_id, f.purchase_id,
               f.p_us - c.c_us AS gap_us,
               f.purchase_id IS NOT NULL AS converted
        FROM clicks c LEFT JOIN first f
          ON f.user_id = c.user_id AND f.click_id = c.click_id
        ORDER BY c.user_id, c.click_id"""),
    ),

    // ---- e14: event-rate anomaly detection (z-score over minutely rate) --
    // The ops-dashboard operator: minutes whose event rate deviates >2σ
    // from the stream's mean rate. Moments are EXACT integer sums (counts
    // and squared counts in BIGINT — no float-accumulation order
    // dependence); mean/variance/z are then a fixed dag of double ops,
    // bit-identical in any engine. The stats side is ONE row broadcast
    // against the per-minute aggregate, so at 100 TB the cost is the e09
    // minutely rollup plus a free map — and the same shape runs
    // incrementally: the (sum, sumsq, n) triple is a mergeable sketch.
    QueryDef(
      "e14_rate_anomaly",
      (s, dir) => {
        import s.implicits._
        // persist the per-minute rollup: it feeds BOTH the stats branch
        // and the scoring branch, and Spark does not share unpersisted
        // subtrees — without this the dominant events aggregation runs
        // twice at any scale
        val perMin = t(s, dir, "events")
          .groupBy(unix_micros(date_trunc("minute", $"ts")).as("minute_us"))
          .agg(count(lit(1)).as("n"))
          .persistOnce()
        val stats = perMin.agg(
          sum($"n").as("s"), sum($"n" * $"n").as("sq"), count(lit(1)).as("cnt"))
        perMin.crossJoin(broadcast(stats))
          .withColumn("mean", $"s".cast("double") / $"cnt")
          .withColumn("z",
            ($"n" - $"mean") /
              sqrt($"sq".cast("double") / $"cnt" - $"mean" * $"mean"))
          .filter(abs($"z") > 2.0)
          .select($"minute_us", $"n", $"z")
          .orderBy($"minute_us")
      },
      Some("""
        WITH m AS (
          SELECT epoch_us(DATE_TRUNC('minute', ts)) AS minute_us, COUNT(*) AS n
          FROM events GROUP BY 1),
        st AS (SELECT SUM(n) AS s, SUM(n*n) AS sq, COUNT(*) AS cnt FROM m),
        z AS (
          SELECT minute_us, n,
                 (n - CAST(s AS DOUBLE)/cnt)
                   / sqrt(CAST(sq AS DOUBLE)/cnt - (CAST(s AS DOUBLE)/cnt)*(CAST(s AS DOUBLE)/cnt)) AS z
          FROM m, st)
        SELECT minute_us, n, z FROM z WHERE abs(z) > 2.0 ORDER BY minute_us"""),
    ),

    // ---- e15: hopping (sliding) windows — 10-minute window, 5-minute ----
    // ---- slide ----
    // The smoothing window shape e01/e09 can't express: each event
    // belongs to TWO overlapping windows (len/slide = 2), so rates read
    // at 5-minute resolution with 10 minutes of context. Spark's
    // window(ts, len, slide) expands each row into its windows before the
    // hash aggregate — a bounded 2x fan-out, shuffled once on the window
    // key; the oracle expands the same two epoch-aligned window starts
    // arithmetically. At 100 TB the knob is len/slide (the fan-out
    // factor) — the plan shape is e09's with a constant-factor explode.
    QueryDef(
      "e15_hopping_windows",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
          .select(unix_micros($"w.start").as("win_us"), $"n", $"total_value")
          .filter($"n" >= 5)
          .orderBy($"win_us")
      },
      Some(s"""
        WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
        w AS (
          SELECT (us // 300000000 - k) * 300000000 AS win_us, value
          FROM e CROSS JOIN (SELECT unnest(range(2)) AS k) ks)
        SELECT win_us, COUNT(*) AS n, ${SUM("value")} AS total_value
        FROM w GROUP BY win_us HAVING COUNT(*) >= 5 ORDER BY win_us"""),
    ),

    // ---- e16: strict-order multi-step funnel (view → click → purchase) --
    // e03's two-step funnel generalized to an ORDERED chain with per-step
    // deadlines: first view, then the first click within 24h OF THAT
    // VIEW, then the first purchase within 24h OF THAT CLICK — each step
    // anchors on the previous step's event, not the funnel start, which
    // is what "strict order" means and what a pair of independent EXISTS
    // checks gets wrong. Three per-user min-aggregates chained by
    // broadcast-size joins (the funnel population only shrinks): at
    // 100 TB each stage is one shuffle on user_id over an
    // already-filtered event subset. The per-user step frames are
    // user-count-sized and each feeds TWO consumers (the next stage and
    // its own funnel count) — materialized once so neither consumer
    // re-derives the events aggregation from lineage.
    QueryDef(
      "e16_strict_funnel",
      (s, dir) => {
        import s.implicits._
        val dayUs = 86400000000L
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("t0"))
          .materialized
        val c = ev.filter($"event_type" === "click")
          .join(v, "user_id")
          .filter($"us" > $"t0" && $"us" <= $"t0" + dayUs)
          .groupBy($"user_id").agg(min($"us").as("t1"))
          .materialized
        val p = ev.filter($"event_type" === "purchase")
          .join(c, "user_id")
          .filter($"us" > $"t1" && $"us" <= $"t1" + dayUs)
          .groupBy($"user_id").agg(min($"us").as("t2"))
        v.agg(count(lit(1)).as("step1_view"))
          .crossJoin(c.agg(count(lit(1)).as("step2_click")))
          .crossJoin(p.agg(count(lit(1)).as("step3_purchase")))
          .withColumn("click_rate", $"step2_click".cast("double") / $"step1_view")
          .withColumn("purchase_rate", $"step3_purchase".cast("double") / $"step2_click")
      },
      Some("""
        WITH v AS (
          SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click'
            AND epoch_us(e.ts) > v.t0 AND epoch_us(e.ts) <= v.t0 + 86400000000
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) > c.t1 AND epoch_us(e.ts) <= c.t1 + 86400000000
          GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS step1_view,
               (SELECT COUNT(*) FROM c) AS step2_click,
               (SELECT COUNT(*) FROM p) AS step3_purchase,
               CAST((SELECT COUNT(*) FROM c) AS DOUBLE)/(SELECT COUNT(*) FROM v) AS click_rate,
               CAST((SELECT COUNT(*) FROM p) AS DOUBLE)/(SELECT COUNT(*) FROM c) AS purchase_rate"""),
    ),

    // ---- e17: as-of join through the NATIVE operator ----
    // e10's semantics (last view at-or-before each purchase) through
    // `graft.plans.AsOf.join` — the custom sorted-merge BinaryExecNode —
    // under the DuckDB hash gate: a hash match proves the custom join
    // path end-to-end against the correlated-subquery oracle. e10 keeps
    // the window-composition form; this is the operator a user would
    // actually call. Plan: one hash exchange + sort per side, one
    // streaming merge pass (AsOfJoinSpec locks the shape).
    QueryDef(
      "e17_asof_native",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"us")
        val views = ev.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"us".as("view_us"))
        graft.plans.AsOf.join(purchases, views, "user_id", "v_user", "us", "view_us")
          .select($"user_id", $"event_id", $"us".as("purchase_us"), $"view_us",
            ($"us" - $"view_us").as("gap_us"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT e.user_id, e.event_id, epoch_us(e.ts) AS purchase_us,
               (SELECT MAX(epoch_us(v.ts)) FROM events v
                WHERE v.user_id = e.user_id AND v.event_type = 'view'
                  AND epoch_us(v.ts) <= epoch_us(e.ts)) AS view_us,
               epoch_us(e.ts) - (SELECT MAX(epoch_us(v.ts)) FROM events v
                WHERE v.user_id = e.user_id AND v.event_type = 'view'
                  AND epoch_us(v.ts) <= epoch_us(e.ts)) AS gap_us
        FROM events e WHERE e.event_type = 'purchase'
        ORDER BY e.user_id, e.event_id"""),
    ),

    // ---- e18: bot detection by inter-event timing regularity ----
    // Scripted traffic fires on a clock; humans are bursty. The flag is
    // the squared coefficient of variation of a user's inter-event gaps —
    // organic users on this corpus sit at CV²·10⁴ ≈ 5000–10000
    // (Poisson-ish, CV ≈ 1), a metronome scores ~0. The corpus has no
    // bots, so — the t18/t20 injection recipe — three synthetic bot
    // streams (100 events each at a fixed per-bot period, ±1 s
    // alternating jitter so the variance is small but nonzero) are
    // unioned in deterministically, and the operator must flag exactly
    // those. All integer arithmetic: gaps floor to whole seconds, and
    // CV²·10⁴ = (n·Σg² − (Σg)²)·10⁴ DIV (Σg)² stays in BIGINT (gaps ≤
    // ~10⁵ s, n ≤ 10³ per user ⇒ the numerator is ≤ ~10¹⁸), so both
    // engines compute the identical value — no float variance formula
    // whose rounding could flip a threshold comparison. One shuffle
    // (window + groupBy share the user_id partitioning); state is one
    // row per user — the 100 TB shape of every per-user audit here.
    QueryDef(
      "e18_bot_regularity",
      (s, dir) => {
        import s.implicits._
        val T0 = 1589400000000000L
        val real = t(s, dir, "events")
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        val bots = s.range(300).selectExpr(
          "CAST(1000000 + id DIV 100 AS BIGINT) AS user_id",
          "CAST(2000000 + id AS BIGINT) AS event_id",
          s"CAST($T0 + (id % 100) * (60 + id DIV 100) * 1000000" +
            " + (id % 100 % 2) * 1000000 AS BIGINT) AS us")
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        real.unionByName(bots)
          .withColumn("dus", $"us" - lag($"us", 1).over(w))
          .filter($"dus".isNotNull)
          .withColumn("gap", expr("dus DIV 1000000"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum($"gap").as("s1"), sum($"gap" * $"gap").as("s2"))
          .filter($"n_gaps" >= 20 && $"s1" > 0)
          .withColumn("cv2q", expr("(n_gaps * s2 - s1 * s1) * 10000 DIV (s1 * s1)"))
          .filter($"cv2q" < 2500)
          .select($"user_id", $"n_gaps", $"cv2q")
          .orderBy($"user_id")
      },
      Some("""
        WITH uni AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events
          UNION ALL
          SELECT 1000000 + k // 100, 2000000 + k,
                 1589400000000000 + (k % 100) * (60 + k // 100) * 1000000
                   + (k % 100 % 2) * 1000000
          FROM (SELECT unnest(range(300)) AS k) r),
        g AS (
          SELECT user_id,
                 us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS dus
          FROM uni),
        st AS (
          SELECT user_id, COUNT(*) AS n_gaps,
                 CAST(SUM(dus // 1000000) AS BIGINT) AS s1,
                 CAST(SUM((dus // 1000000) * (dus // 1000000)) AS BIGINT) AS s2
          FROM g WHERE dus IS NOT NULL GROUP BY user_id
          HAVING COUNT(*) >= 20 AND SUM(dus // 1000000) > 0)
        SELECT user_id, n_gaps,
               (n_gaps * s2 - s1 * s1) * 10000 // (s1 * s1) AS cv2q
        FROM st WHERE (n_gaps * s2 - s1 * s1) * 10000 // (s1 * s1) < 2500
        ORDER BY user_id"""),
    ),

    // ---- e19: ordered funnel conversion ----
    // The product-analytics staple: of the users who signed up, how many
    // then clicked AFTER signing up, and then purchased AFTER that click —
    // order matters, so this is NOT three independent counts (a purchase
    // before signup must not convert). Earliest-chain semantics: t1 =
    // first signup, t2 = first click strictly after t1, t3 = first
    // purchase strictly after t2 — each stage a per-user min-aggregate
    // joined to the previous stage's frame, the e16 shrink-only-join
    // chain; strict `>` on exact epoch-micros is deterministic in both
    // engines. The three stage counts collapse in ONE scalar aggregate
    // over the left-joined per-user frame (count ignores nulls), then
    // `stack` melts the single row into the 3-row funnel with an integer
    // ×10⁴ share of stage 1. 100 TB: three user_id shuffles on per-user
    // aggregates plus one partial-agg scalar reduce — no window, no
    // cartesian, no driver loop.
    QueryDef(
      "e19_funnel_conversion",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        val s1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"us").as("t1"))
        val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
          .filter($"us" > $"t1").groupBy($"user_id").agg(min($"us").as("t2"))
        val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
          .filter($"us" > $"t2").groupBy($"user_id").agg(min($"us").as("t3"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .agg(count($"t1").as("u1"), count($"t2").as("u2"), count($"t3").as("u3"))
          .selectExpr(
            """stack(3,
                 1L, 'signup',               u1,
                 2L, 'click_after_signup',   u2,
                 3L, 'purchase_after_click', u3) AS (stage, step, users)""",
            "u1")
          .selectExpr("stage", "step", "users",
            "users * 10000 DIV u1 AS pct_of_first_q")
          .orderBy($"stage")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
        s3 AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id),
        one AS (
          SELECT COUNT(t1) AS u1, COUNT(t2) AS u2, COUNT(t3) AS u3
          FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS step, u1 AS users,
               u1 * 10000 // u1 AS pct_of_first_q FROM one
        UNION ALL
        SELECT 2, 'click_after_signup', u2, u2 * 10000 // u1 FROM one
        UNION ALL
        SELECT 3, 'purchase_after_click', u3, u3 * 10000 // u1 FROM one
        ORDER BY stage"""),
    ),

    // ---- e20: retention cohort matrix ----
    // The other product-analytics staple next to e19's funnel: users
    // bucketed by the epoch-week of their FIRST event (the cohort), then
    // for each cohort × weeks-since, how many of its users were active
    // that week — the retention triangle every growth dashboard draws.
    // All integer arithmetic on exact epoch-micros (week = us DIV
    // 604800000000, weeks_since = active_week − cohort_week, share as
    // ×10⁴ integer division). The organic corpus is DENSE (every user
    // active every week ⇒ a flat 100% triangle), so — the t18/t20/e18
    // injection recipe — 60 deterministic churning users are unioned in:
    // cohorts staggered by id%3, each staying 1+id%5 weeks then gone,
    // giving the triangle real decay the oracle must reproduce.
    // Dataflow: one per-user min-aggregate (cohort), one distinct over
    // (user, week) (activity), a user_id equi-join binding the two, a
    // (cohort, delta)-keyed aggregate, and a cohort-sized join for the
    // denominator — every shuffle keyed on user_id or the tiny cohort
    // key, no window at all. 100 TB: user cardinality bounds everything;
    // the output is weeks² rows.
    QueryDef(
      "e20_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        val real = t(s, dir, "events")
          .select($"user_id", expr("unix_micros(ts) DIV 604800000000").as("week"))
        val churners = s.range(60)
          .selectExpr("CAST(2000000 + id AS BIGINT) AS user_id",
            "CAST(2817 + id % 3 AS BIGINT) AS start_week",
            "CAST(1 + id % 5 AS BIGINT) AS stay")
          .withColumn("d", explode(expr("sequence(0L, stay - 1)")))
          .select($"user_id", ($"start_week" + $"d").as("week"))
        val wk = real.unionByName(churners)
        val cohort = wk.groupBy($"user_id").agg(min($"week").as("cohort_week"))
        val sizes = cohort.groupBy($"cohort_week").agg(count(lit(1)).as("cohort_size"))
        wk.distinct()
          .join(cohort, "user_id")
          .groupBy($"cohort_week", ($"week" - $"cohort_week").as("weeks_since"))
          .agg(count(lit(1)).as("active_users"))
          .join(sizes, "cohort_week")
          .withColumn("retained_pct_q",
            expr("active_users * 10000 DIV cohort_size"))
          .select($"cohort_week", $"weeks_since", $"active_users",
            $"cohort_size", $"retained_pct_q")
          .orderBy($"cohort_week", $"weeks_since")
      },
      Some("""
        WITH wk AS (
          SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
          UNION ALL
          SELECT 2000000 + k AS user_id,
                 2817 + k % 3 + unnest(range(1 + k % 5)) AS week
          FROM (SELECT unnest(range(60)) AS k) r),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id),
        sizes AS (
          SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY 1),
        act AS (SELECT DISTINCT user_id, week FROM wk),
        m AS (
          SELECT cohort_week, week - cohort_week AS weeks_since,
                 COUNT(*) AS active_users
          FROM act JOIN cohort USING (user_id)
          GROUP BY 1, 2)
        SELECT cohort_week, weeks_since, active_users, cohort_size,
               active_users * 10000 // cohort_size AS retained_pct_q
        FROM m JOIN sizes USING (cohort_week)
        ORDER BY cohort_week, weeks_since"""),
    ),

    // ---- e21: sessionization via the NATIVE session_window operator ----
    // e02 composes sessions from lag + running-sum window functions — two
    // sorts per user partition. This is the same semantics expressed with
    // Spark's built-in `session_window`, the operator a production
    // pipeline should reach for first: one hash shuffle on user_id, the
    // session merge runs inside UpdatingSessionsExec with NO ranking
    // window, and the IDENTICAL expression works under Structured
    // Streaming with a watermark (SessionWindowStateSpec locks batch ==
    // streaming on a boundary-exact fixture). Session-merge boundary is
    // CLOSED: an event exactly `gap` after the previous one still MERGES
    // (the windows [t, t+gap] touch, and touching sessions merge —
    // verified empirically in SessionWindowStateSpec, since the docs
    // don't pin it), so the oracle's island rule is `diff > gap`, the
    // same rule e02's hand-rolled sessionizer uses.
    // window.end is lastEvent + gap by definition — emitted as-is so the
    // output is the operator's true contract, not a re-derivation.
    QueryDef(
      "e21_session_window_native",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id", session_window($"ts", "15 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), dsum($"value").as("session_value"))
          .select($"user_id",
            unix_micros($"sw.start").as("start_us"),
            unix_micros($"sw.end").as("end_us"),
            $"n_events", $"session_value")
          .orderBy($"user_id", $"start_us")
      },
      Some(s"""
        WITH g AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS us,
                 CASE WHEN LAG(epoch_us(ts), 1) OVER w IS NULL
                        OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 900000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        sess AS (
          SELECT user_id, value, us,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM g)
        SELECT user_id, MIN(us) AS start_us, MAX(us) + 900000000 AS end_us,
               COUNT(*) AS n_events, ${SUM("value")} AS session_value
        FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us"""),
    ),

    // ---- e23: count-min-sketch heavy hitters (mergeable frequency sketch) ----
    // The sketch-family member q30 (HLL distinct) and q48 (quantile sketch)
    // don't cover: a Cormode–Muthukrishnan count-min sketch (D=4 rows x
    // W=64 cells, md5 row-hashes so the DuckDB oracle replays them) with
    // the one-sided guarantee est >= true surfaced explicitly — the true
    // top-20 users are reported with BOTH their exact count and the
    // sketch's min-of-rows estimate. Dataflow is the scalable order:
    // exact per-user counts FIRST (one partial-combined aggregate — the
    // only corpus-sized shuffle), then the sketch is built from the
    // 150-row user-count frame, NOT from raw events (cell[j][b] =
    // sum of n over users hashing there — identical to streaming
    // increments because addition commutes). The D x W = 256-cell sketch
    // is a broadcastable model; at 100 TB each executor sketches its
    // partition and the reduce is cell-wise sum — the mergeability that
    // makes CMS a streaming/ambient-state primitive (and why the
    // estimate join below broadcasts the sketch, never shuffles users).
    QueryDef(
      "e23_cmsketch_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val D = 4
        val W = 64L
        def bucket(j: org.apache.spark.sql.Column,
            u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          conv(substring(md5(concat(j.cast("string"), lit("-"),
            u.cast("string"))), 1, 6), 16, 10).cast("long") % W
        val perUser = t(s, dir, "events")
          .groupBy($"user_id").agg(count(lit(1)).as("n"))
        val hashed = perUser.select($"user_id", $"n",
          explode(array((0 until D).map(j =>
            struct(lit(j).as("j"), bucket(lit(j), $"user_id").as("b"))): _*)).as("jb"))
          .select($"user_id", $"n", $"jb.j".as("j"), $"jb.b".as("b"))
        val cells = hashed.groupBy($"j", $"b").agg(sum($"n").as("cnt"))
        val est = hashed.join(broadcast(cells), Seq("j", "b"))
          .groupBy($"user_id", $"n").agg(min($"cnt").as("est"))
        // top-20 via TakeOrdered FIRST (scale-safe), then rank the 20
        // survivors — the e05 pattern; the unpartitioned window never
        // sees more than the limit
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"n".desc, $"user_id")
        est.orderBy($"n".desc, $"user_id").limit(20)
          .withColumn("rn", row_number().over(w))
          .select($"user_id", $"n", $"est", $"rn")
          .orderBy($"rn")
      },
      Some("""
        WITH per_user AS (
          SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        hashed AS (
          SELECT user_id, n, j,
                 CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '-' ||
                   CAST(user_id AS VARCHAR)), 1, 6) AS BIGINT) % 64 AS b
          FROM per_user, unnest(range(0, 4)) r(j)),
        cells AS (
          SELECT j, b, CAST(SUM(n) AS BIGINT) AS cnt FROM hashed GROUP BY j, b),
        est AS (
          SELECT user_id, n, MIN(cnt) AS est
          FROM hashed JOIN cells USING (j, b)
          GROUP BY user_id, n),
        ranked AS (
          SELECT user_id, n, est,
                 ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn
          FROM est)
        SELECT user_id, n, est, rn FROM ranked WHERE rn <= 20 ORDER BY rn"""),
    ),

    // ---- e24: CEP pattern matching (strict contiguity, regex quantifiers) ----
    // The complex-event-processing semantics (Flink CEP / MATCH_RECOGNIZE)
    // the funnel family deliberately does NOT have: e03/e16/e19 are
    // RELAXED-contiguity funnels (other events may intervene between
    // steps); this is STRICT contiguity with quantifiers — `vc*p` counts
    // view→purchase conversions where ONLY clicks sit between the steps
    // (an intervening error/signup breaks the match), and `ee+` counts
    // runs of >=2 consecutive errors (the ops burst signal). Re-expressed
    // Spark-first: the per-user timeline collapses to a type-initial
    // string (one ordered aggregate — initials are distinct across the
    // five types) and each pattern is one non-overlapping leftmost regex
    // scan. Patterns avoid alternation so Java regex (Spark) and RE2
    // (DuckDB) agree on match boundaries. Scale: the shuffle is the same
    // per-user exchange every e-query pays; the timeline string is
    // bounded by per-user activity (the e02 boundedness class) and the
    // regex runs once per user — a time-windowed variant would compose
    // the same aggregate over e02's session_id instead of the whole user.
    QueryDef(
      "e24_cep_pattern",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("ch", substring($"event_type", 1, 1))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            concat_ws("", transform(
              array_sort(collect_list(struct($"us", $"event_id", $"ch"))),
              x => x.getField("ch"))).as("tl"))
          .select($"user_id", $"n_events",
            size(regexp_extract_all($"tl", lit("vc*p"), lit(0)))
              .cast("long").as("n_conv"),
            size(regexp_extract_all($"tl", lit("ee+"), lit(0)))
              .cast("long").as("n_error_bursts"))
          .orderBy($"user_id")
      },
      Some("""
        WITH tl AS (
          SELECT user_id, COUNT(*) AS n_events,
                 string_agg(substr(event_type, 1, 1), ''
                   ORDER BY epoch_us(ts), event_id) AS tl
          FROM events GROUP BY user_id)
        SELECT user_id, n_events,
               CAST(len(regexp_extract_all(tl, 'vc*p')) AS BIGINT) AS n_conv,
               CAST(len(regexp_extract_all(tl, 'ee+')) AS BIGINT) AS n_error_bursts
        FROM tl ORDER BY user_id"""),
    ),

    // ---- e25: RANGE-interval window frame (trailing 1h per event) ----
    // The window FRAME type the rest of the inventory doesn't exercise:
    // q42/e14 use ROWS frames (count-based), this is RANGE over an
    // interval — per event, activity in the PRECEDING HOUR of event time,
    // however many rows that is. RANGE frames include peers (equal
    // timestamps) in BOTH engines, so the frame is well-defined without a
    // tie-break and the ordering key must be the single `us` expression
    // (Spark's rangeBetween contract). The summed value is quantized to
    // integer cents FIRST — a double sum inside a sliding frame would be
    // order-sensitive. Scale: one user_id exchange (the e-family shuffle),
    // per-user sort; Spark evaluates the sliding frame with two pointers
    // over the sorted run — work linear in events, frame never
    // materialized. The streaming twin of this shape is e09/e14's
    // minutely-rate state (EventTimeWindows.minutelyRate): a production
    // stream maintains the bucketed approximation, the batch RANGE frame
    // is the exact retrospective answer.
    QueryDef(
      "e25_trailing_range_window",
      (s, dir) => {
        import s.implicits._
        val hourUs = 3600000000L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"us")
          .rangeBetween(-hourUs, 0L)
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("cents", round($"value" * 100).cast("long"))
          .select($"user_id", $"event_id", $"us",
            count(lit(1)).over(w).as("n_trailing_1h"),
            sum($"cents").over(w).as("cents_trailing_1h"))
          .orderBy($"user_id", $"us", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS us,
               COUNT(*) OVER w AS n_trailing_1h,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                 AS cents_trailing_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, us, event_id"""),
    ),

    // ---- e26: exact trailing MEDIAN (order statistic in a frame) ----
    // The sliding-window ORDER STATISTIC the sum/count frames (q42, e25)
    // can't derive: per event, the exact median of the last 7 values in
    // the user's timeline — the robust-baseline primitive behind spike
    // detectors (e14 compares against a trailing MEAN, which one outlier
    // drags; the median doesn't budge). Both engines materialize the
    // ≤7-element frame, sort it, and apply the SAME midpoint formula
    // (lo+hi)/2 — deliberately NOT DuckDB's median() window aggregate,
    // whose lo+0.5·(hi−lo) interpolation differs from (lo+hi)/2 in
    // double rounding. For odd frames lo==hi and the formula is exact.
    // Scale: one user_id exchange + per-user sort (the e-family shuffle);
    // the frame is O(7) per row, so the collect_list is bounded — this is
    // the bounded-frame exception to the no-collect rule, same as e12's
    // fixed transition alphabet. A percentile other than 0.5 swaps the
    // two element_at indexes; the t-digest swap at unbounded frames is
    // documented at q38.
    QueryDef(
      "e26_trailing_median",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"us", $"event_id")
          .rowsBetween(-6, 0)
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("fr", sort_array(collect_list($"value").over(w)))
          .withColumn("n", size($"fr"))
          .select($"user_id", $"event_id", $"us", $"n".cast("long").as("n_frame"),
            ((element_at($"fr", (($"n" + 1) / 2).cast("int")) +
              element_at($"fr", ($"n" / 2 + 1).cast("int"))) / 2).as("med_trailing"))
          .orderBy($"user_id", $"us", $"event_id")
      },
      Some("""
        WITH fr AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 list_sort(list(value) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr
          FROM events)
        SELECT user_id, event_id, us, CAST(len(fr) AS BIGINT) AS n_frame,
               (fr[CAST((len(fr)+1)//2 AS INT)] + fr[CAST(len(fr)//2+1 AS INT)])/2
                 AS med_trailing
        FROM fr ORDER BY user_id, us, event_id"""),
    ),

    // ---- e27: hourly gap-fill + LOCF — time-series regularization ----
    // The GRID operator the window queries assume away: every e-query so
    // far computes over hours that HAVE events; a monitoring/feature
    // pipeline needs a value for every hour in the user's span —
    // time_bucket_gapfill + locf in the time-series engines. Two-stage
    // shape: (1) per-(user, hour) last observation — one map-side-
    // combinable hash-agg over the stream, the only corpus-sized pass,
    // with the tie-break on a (us, event_id) struct so the pick is
    // deterministic even under timestamp collisions; (2) the filled grid
    // by SPAN-EXPLODE: one lead() over each user's observed hours (the
    // grid runs [first obs, last obs], so every grid hour's LOCF source
    // is exactly the observation opening its span), then
    // sequence(h, nexth-1) exploded — the fill value rides the span row
    // and carry_age is the offset into the span. Row-identical to the
    // grid-join + running-LOCF-window formulation, but the windowed
    // relation is the OBSERVED table (one row per user-hour-with-events,
    // ~10x smaller than the dense grid here), there is no grid↔obs join
    // at all, and the summary agg reuses the window's user_id
    // partitioning — measured 2.5x at sf0.1 (0.82s vs 2.1s). The
    // 1500-row output is ordered by a single-partition sort: a range
    // orderBy's sampling pass would re-execute the upstream stage.
    // carry_age audits staleness (hours since the carried observation);
    // cents quantization is the e25 contract so the fill checksum
    // compares exactly. At 100 TB the grid grows with users × span, not
    // events — the regularized frame is usually SMALLER than its input.
    QueryDef(
      "e27_hourly_gapfill",
      (s, dir) => {
        import s.implicits._
        // tie-break struct: field-by-field ordering of the non-negative
        // (us, event_id) pair — same total order as the oracle's
        // zero-padded printf string, without a 40-char alloc per event.
        // An event with NULL value is NOT an observation (filtered at the
        // source, mirrored in the oracle's ev CTE): without the filter the
        // two formulations diverge on whether a null-valued hour opens a
        // carry span, so the semantics are pinned where both engines agree
        // by construction for ANY input.
        val obs = t(s, dir, "events")
          .filter($"value".isNotNull)
          .select($"user_id", expr("unix_micros(ts) div 3600000000").as("h"),
            struct(unix_micros($"ts").as("us"), $"event_id".as("eid")).as("ord"),
            $"value")
          .groupBy($"user_id", $"h")
          .agg(max_by($"value", $"ord").as("vlast"))
        val w = Window.partitionBy($"user_id").orderBy($"h")
        obs
          .withColumn("nexth", lead($"h", 1).over(w))
          .select($"user_id", $"h", $"vlast",
            explode(sequence($"h", coalesce($"nexth" - 1, $"h"))).as("gh"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_hours"),
            count(when($"gh" === $"h", 1)).as("n_observed"),
            (count(lit(1)) - count(when($"gh" === $"h", 1))).as("n_carried"),
            max($"gh" - $"h").as("max_carry_age"),
            sum(round($"vlast" * 100).cast("long")).as("cents_filled"))
          .repartition(1).sortWithinPartitions($"user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 3600000000 AS h,
                 epoch_us(ts) AS us, event_id, value
          FROM events WHERE value IS NOT NULL),
        obs AS (
          SELECT user_id, h,
                 arg_max(value, printf('%020d%020d', us, event_id)) AS vlast
          FROM ev GROUP BY user_id, h),
        span AS (
          SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax FROM obs GROUP BY user_id),
        grid AS (
          SELECT user_id, unnest(generate_series(hmin, hmax)) AS h FROM span),
        filled AS (
          SELECT g.user_id, g.h, o.vlast,
                 last_value(o.vlast IGNORE NULLS) OVER w AS v_fill,
                 g.h - last_value(CASE WHEN o.vlast IS NOT NULL THEN g.h END
                   IGNORE NULLS) OVER w AS carry_age
          FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
          WINDOW w AS (PARTITION BY g.user_id ORDER BY g.h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(COUNT(vlast) AS BIGINT) AS n_observed,
               CAST(COUNT(*) - COUNT(vlast) AS BIGINT) AS n_carried,
               CAST(MAX(carry_age) AS BIGINT) AS max_carry_age,
               CAST(SUM(CAST(round(v_fill * 100) AS BIGINT)) AS BIGINT)
                 AS cents_filled
        FROM filled GROUP BY user_id ORDER BY user_id"""),
    ),

    // ---- e28: conversion-lag distribution — how long activation takes ----
    // The timing complement to the funnels (e03/e16/e19 count WHO
    // converts; this measures HOW LONG it takes): per user, first signup
    // → first strictly-later purchase, and the exact quartiles of that
    // lag in seconds over converted users. Spark `percentile` and DuckDB
    // `quantile_cont` share the exact interpolation rule on the
    // integer-seconds lags (the q38 contract). conv_ppm is an exact
    // integer ratio. Shape: two per-user min-aggregates joined on
    // user_id (co-partitioned, one shuffle family), then a one-row
    // quantile aggregate over the user-sized lag frame — the quantile
    // never touches the event stream itself; at larger user counts the
    // t-digest swap is the same note as q38.
    QueryDef(
      "e28_conversion_lag",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        val signup = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"us").as("s_us"))
        val lag = ev.filter($"event_type" === "purchase")
          .join(signup, "user_id")
          .filter($"us" > $"s_us")
          .groupBy($"user_id").agg(min($"us").as("p_us"), min($"s_us").as("s_us"))
          .select($"user_id", (($"p_us" - $"s_us") / 1000000L).cast("long").as("lag_s"))
        signup.agg(count(lit(1)).as("n_signup")).crossJoin(
          lag.agg(count(lit(1)).as("n_converted"),
            expr("percentile(lag_s, 0.25)").as("lag_p25"),
            expr("percentile(lag_s, 0.5)").as("lag_p50"),
            expr("percentile(lag_s, 0.75)").as("lag_p75")))
          .withColumn("conv_ppm", expr("(n_converted * 1000000) div n_signup"))
          .select($"n_signup", $"n_converted", $"conv_ppm",
            $"lag_p25", $"lag_p50", $"lag_p75")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s AS (SELECT user_id, MIN(us) AS s_us FROM ev
              WHERE event_type = 'signup' GROUP BY user_id),
        lag AS (
          SELECT e.user_id,
                 CAST((MIN(e.us) - MIN(s.s_us)) // 1000000 AS BIGINT) AS lag_s
          FROM ev e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.us > s.s_us
          GROUP BY e.user_id),
        agg AS (
          SELECT COUNT(*) AS n_converted,
                 quantile_cont(lag_s, 0.25) AS lag_p25,
                 quantile_cont(lag_s, 0.5) AS lag_p50,
                 quantile_cont(lag_s, 0.75) AS lag_p75
          FROM lag),
        ns AS (SELECT COUNT(*) AS n_signup FROM s)
        SELECT n_signup, n_converted,
               (n_converted * 1000000) // n_signup AS conv_ppm,
               lag_p25, lag_p50, lag_p75
        FROM ns CROSS JOIN agg"""),
    ),

    // ---- e29: trailing behavioral diversity (distinct-count frame) ----
    // The third frame statistic next to e25's sum and e26's order
    // statistic: per event, how many DISTINCT event types the user's
    // last 7 events span — the behavioral-variety signal (a run of 7
    // identical types reads as automation; the e18 regularity filter's
    // categorical cousin). Exact because the frame is bounded: both
    // engines materialize the ≤7-element frame and count distincts —
    // the bounded-frame exception again; an unbounded distinct-over-
    // window would be the q30 approx_count_distinct swap instead.
    QueryDef(
      "e29_trailing_diversity",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"us", $"event_id")
          .rowsBetween(-6, 0)
        // ONE corpus exchange instead of two (r18): range-partition by
        // user_id up front — equal keys colocate under range
        // partitioning, so the window's ClusteredDistribution(user_id)
        // is satisfied, and the window's required within-partition sort
        // (user_id, us, event_id) IS the output order, so the final
        // global sort collapses to the already-satisfied
        // sortWithinPartitions. The r17 shape hash-exchanged the corpus
        // for the window and then range-exchanged + re-sorted it again
        // for the ORDER BY.
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .repartitionByRange($"user_id")
          .select($"user_id", $"event_id", $"us",
            size(array_distinct(collect_list($"event_type").over(w)))
              .cast("long").as("n_distinct_types"))
          .sortWithinPartitions($"user_id", $"us", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(len(list_distinct(list(event_type) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))) AS BIGINT)
                 AS n_distinct_types
        FROM events ORDER BY user_id, us, event_id"""),
    ),

    // ---- e30: trending types per hour — top-k-per-window through ----
    // ---- the custom TopKPerKey plan ----
    // The "what's trending each hour" dashboard query: per-hour
    // event-type counts, top-2 types per hour by (count desc, type asc).
    // The pick runs on the custom TopKPerKey physical operator (bounded
    // per-partition heaps around one hash exchange) rather than a
    // rank-filter window — with few types per hour either wins, but at
    // 100 TB the window form sorts every hour's full type list through
    // one task per hot hour while the heap form shuffles only survivors;
    // this is the q46/p12 operator applied to the event-time dimension.
    // The hour is emitted as a formatted string (no raw timestamps in
    // query outputs — the driver-gate contract).
    QueryDef(
      "e30_trending_types",
      (s, dir) => {
        import s.implicits._
        val counts = t(s, dir, "events")
          .withColumn("hour", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00"))
          .groupBy($"hour", $"event_type")
          .agg(count(lit(1)).as("n"))
        graft.plans.TopK.perKey(counts, Seq("hour"),
          Seq("n" -> false, "event_type" -> true), 2)
          .select($"hour", $"event_type", $"n")
          .orderBy($"hour", $"n".desc, $"event_type")
      },
      Some("""
        SELECT hour, event_type, n FROM (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                 event_type, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                   ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY date_trunc('hour', ts), event_type) x
        WHERE rn <= 2 ORDER BY hour, n DESC, event_type"""),
    ),

    // ---- e31: watermark-lag audit — distributed prefix scan ----
    // The question every Structured-Streaming deployment asks before
    // picking `withWatermark`: under the real arrival order, how late do
    // events run behind the high-watermark (the max event time seen so
    // far)? The events table arrives exactly time-ordered, so the audit
    // replays it under a DETERMINISTIC network-jitter permutation
    // (arrival key = event_id + md5(event_id) % 64 — the md5 stub both
    // engines reproduce) and computes each event's lateness against the
    // running max event time. The running max over a global order is the
    // unpartitioned-window trap; here it is graft.plans.PrefixScan —
    // range shuffle + per-partition fold + #partitions-row carry window
    // + one imperative partition scan, ONE corpus-sized shuffle total
    // (the step-2/step-3 subtrees share the exchange via ReusedExchange).
    // The report is a plain per-type hash-agg of integer lateness.
    QueryDef(
      "e31_watermark_lag",
      (s, dir) => {
        import s.implicits._
        val arr = t(s, dir, "events")
          .select($"event_id", $"event_type",
            unix_micros($"ts").as("tus"),
            ($"event_id" +
              conv(substring(md5($"event_id".cast("string")), 1, 2), 16, 10)
                .cast("long") % 64).as("ak"))
        graft.plans.PrefixScan
          .runningMax(arr, Seq($"ak", $"event_id"), $"tus", "wm")
          .withColumn("late_us", $"wm" - $"tus")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum(when($"late_us" > 0L, 1L).otherwise(0L)).as("n_late"),
            max($"late_us").as("max_late_us"),
            sum($"late_us").as("sum_late_us"))
          .orderBy($"event_type")
      },
      Some("""
        WITH arr AS (
          SELECT event_id, event_type, epoch_us(ts) AS tus,
                 event_id + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2) AS BIGINT) % 64 AS ak
          FROM events),
        lat AS (
          SELECT event_type,
                 MAX(tus) OVER (ORDER BY ak, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS late_us
          FROM arr)
        SELECT event_type, COUNT(*) AS n,
               COUNT(*) FILTER (WHERE late_us > 0) AS n_late,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us,
               CAST(SUM(late_us) AS BIGINT) AS sum_late_us
        FROM lat GROUP BY event_type ORDER BY event_type"""),
    ),

    // ---- e32: behavioral entropy — how predictable is each user ----
    // The segmentation axis e18's timing regularity doesn't measure:
    // Shannon entropy of each user's event-TYPE distribution. A
    // single-action bot scores 0 bits; a user spread evenly over all
    // five types scores log2(5); recommendation/anomaly pipelines bucket
    // on exactly this. Computed per the t15/t16 contract — both engines
    // evaluate the same  log2(N) − Σ c·log2(c) / N  double expression
    // over per-(user, type) counts and quantize ×10⁴ (round-off ~1e-13
    // relative, far below the grid). Shape: two hash-aggs keyed on
    // user_id — (user, type) counts, then the per-user moment — both
    // map-side combinable, output bounded by the user population, no
    // window and no join anywhere.
    QueryDef(
      "e32_behavioral_entropy",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).cast("double").as("cnt"))
          .groupBy($"user_id")
          .agg(
            sum($"cnt").cast("long").as("n_events"),
            count(lit(1)).as("n_types"),
            round((log2(sum($"cnt")) - sum($"cnt" * log2($"cnt")) / sum($"cnt"))
              * 10000).cast("long").as("entropy_q"))
          .orderBy($"user_id")
      },
      Some("""
        WITH tc AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM events GROUP BY user_id, event_type),
        ent AS (
          SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 log2(SUM(cnt)) - SUM(cnt * log2(cnt)) / SUM(cnt) AS h
          FROM tc GROUP BY user_id)
        SELECT user_id, n_events, n_types,
               CAST(round(h * 10000) AS BIGINT) AS entropy_q
        FROM ent ORDER BY user_id"""),
    ),

    // ---- e33: watermark sizing — the delay-vs-loss decision table ----
    // e31 measured HOW late events run; e33 answers the question that
    // measurement exists for: for each candidate `withWatermark` delay
    // (1 min / 10 min / 1 h / 6 h), exactly how many events would the
    // state-cleanup boundary drop as too-late, and what completeness
    // does the pipeline buy by holding state longer? (An event is lost
    // when its lateness behind the high-watermark exceeds the delay.)
    // Same jittered replay and the same PrefixScan running max as e31;
    // the verdict table is the per-event lateness frame cross-joined
    // with the 4-row candidate list into one conditional count agg —
    // ppm loss by exact integral division. This is the table you read
    // ACROSS: the smallest delay whose dropped_ppm meets the pipeline's
    // completeness SLO is the watermark you deploy.
    QueryDef(
      "e33_watermark_sizing",
      (s, dir) => {
        import s.implicits._
        val arr = t(s, dir, "events")
          .select($"event_id", unix_micros($"ts").as("tus"),
            ($"event_id" +
              conv(substring(md5($"event_id".cast("string")), 1, 2), 16, 10)
                .cast("long") % 64).as("ak"))
        val lat = graft.plans.PrefixScan
          .runningMax(arr, Seq($"ak", $"event_id"), $"tus", "wm")
          .select(($"wm" - $"tus").as("late_us"))
        val delays = s.createDataset(
          Seq(60000000L, 600000000L, 3600000000L, 21600000000L)).toDF("delay_us")
        lat.crossJoin(broadcast(delays))
          .groupBy($"delay_us")
          .agg(
            count(when($"late_us" > $"delay_us", lit(1))).as("n_dropped"),
            count(lit(1)).as("n_total"))
          .select($"delay_us", $"n_dropped", $"n_total",
            expr("n_dropped * 1000000 div n_total").as("dropped_ppm"))
          .orderBy($"delay_us")
      },
      Some("""
        WITH arr AS (
          SELECT event_id, epoch_us(ts) AS tus,
                 event_id + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2) AS BIGINT) % 64 AS ak
          FROM events),
        lat AS (
          SELECT MAX(tus) OVER (ORDER BY ak, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS late_us
          FROM arr),
        d AS (SELECT unnest([CAST(60000000 AS BIGINT), CAST(600000000 AS BIGINT),
                             CAST(3600000000 AS BIGINT), CAST(21600000000 AS BIGINT)]) AS delay_us)
        SELECT delay_us,
               COUNT(CASE WHEN late_us > delay_us THEN 1 END) AS n_dropped,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               COUNT(CASE WHEN late_us > delay_us THEN 1 END) * 1000000 // COUNT(*) AS dropped_ppm
        FROM lat CROSS JOIN d
        GROUP BY delay_us ORDER BY delay_us"""),
    ),

    // ---- e34: emerging types — split-half trend significance ----
    // The trend-DETECTION primitive the ranking queries don't have: e30
    // ranks types within an hour and e14 z-scores a type against its own
    // history, but "is this type's share actually GROWING, beyond
    // noise?" is a two-sample question. Split the stream at the median
    // event_id; under no-change, a type's second-half count n2 is
    // Binomial(n1+n2, ½), and the 2σ test is evaluated in CLEARED
    // integer form — n2 > n1 ∧ (n2−n1)² > 4·(n1+n2) — the s17/e14
    // no-sqrt-no-float house pattern, so both engines agree at the
    // boundary exactly. The corpus is uniform by construction, so the
    // t18/t20 injection recipe simulates a mid-stream feature launch
    // (a deterministic third of first-half clicks removed): the launch
    // type flags emerging, every organically-jittered type does not.
    // Shape: one broadcast one-row midpoint, one conditional hash-agg
    // keyed event_type — map-side combinable, type-bounded output.
    QueryDef(
      "e34_emerging_types",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val mid = ev.agg(
          expr("CAST((min(event_id) + max(event_id)) div 2 AS BIGINT)").as("mid"))
        ev.crossJoin(broadcast(mid))
          .filter(!($"event_type" === "click" && $"event_id" % 3 === 0 &&
            $"event_id" <= $"mid"))
          .withColumn("first_half", $"event_id" <= $"mid")
          .groupBy($"event_type")
          .agg(
            count(when($"first_half", lit(1))).as("n1"),
            count(when(!$"first_half", lit(1))).as("n2"))
          .select($"event_type", $"n1", $"n2",
            expr("n2 * 1000000 div greatest(n1, 1)").as("lift_ppm"),
            ($"n2" > $"n1" &&
              ($"n2" - $"n1") * ($"n2" - $"n1") > lit(4L) * ($"n1" + $"n2"))
              .as("emerging"))
          .orderBy($"event_type")
      },
      Some("""
        WITH b AS (SELECT CAST((MIN(event_id) + MAX(event_id)) // 2 AS BIGINT) AS mid
                   FROM events),
        ev AS (
          SELECT event_type, event_id, (event_id <= mid) AS first_half
          FROM events CROSS JOIN b
          WHERE NOT (event_type = 'click' AND event_id % 3 = 0 AND event_id <= mid)),
        c AS (
          SELECT event_type,
                 COUNT(CASE WHEN first_half THEN 1 END) AS n1,
                 COUNT(CASE WHEN NOT first_half THEN 1 END) AS n2
          FROM ev GROUP BY event_type)
        SELECT event_type, n1, n2,
               n2 * 1000000 // GREATEST(n1, 1) AS lift_ppm,
               (n2 > n1 AND (n2 - n1) * (n2 - n1) > 4 * (n1 + n2)) AS emerging
        FROM c ORDER BY event_type"""),
    ),
  )
}
