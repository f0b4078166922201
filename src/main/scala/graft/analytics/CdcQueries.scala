package graft.analytics

import graft.{QueryDef, Tables}
import graft.sqlx._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch twins of the reference's CDC dataflow operators, expressed over the
  * `events` table (the driver's change-stream stand-in) so the DuckDB oracle
  * can hash-check the semantics:
  *
  *  - c01: replaying an ordered change stream into current state per key —
  *    the MERGE/upsert pattern of a CDC sink (canal/sync.go row replay).
  *  - c02: the per-sink duplicate-event filter on restart — drop everything
  *    at-or-below the checkpointed position (canal/handler_mux.go:81-103).
  *  - c03: the include/exclude regex table filter with the reference's F1
  *    truth table — include-list empty ⇒ include-all, excludes override
  *    (canal/canal.go:290-326).
  *  - c04: min-progress across sinks — the restart position is the MINIMUM
  *    over per-sink checkpoints (ckp/manager.go:160-196), here per
  *    event_type = "sink", position = max processed (ts, event_id).
  */
object CdcQueries {
  import Tables.t

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "c01_current_state",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us".desc, $"event_id".desc)
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id".as("last_event_id"),
            $"event_type".as("last_event_type"), $"us".as("last_us"), $"value".as("last_value"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               us AS last_us, value AS last_value
        FROM (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
              FROM events) x
        WHERE rn = 1 ORDER BY user_id"""),
    ),

    QueryDef(
      "c02_restart_dedup_filter",
      (s, dir) => {
        import s.implicits._
        // checkpointed position: (ts, event_id) of the 5000th event overall —
        // a fixed, data-derived progress point, like a persisted checkpoint
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        // the 5000th event by (us, event_id) WITHOUT a global row_number
        // window (that serializes the whole table through one task):
        // orderBy+limit plans as TakeOrderedAndProject (per-partition top-5000
        // heaps merged on the driver), then the checkpoint row is the max of
        // the 5000 survivors — a one-row aggregate.
        val ckp = ev.select($"us", $"event_id")
          .orderBy($"us", $"event_id").limit(5000)
          .agg(max(struct($"us", $"event_id")).as("m"))
          .select($"m.us".as("ckp_us"), $"m.event_id".as("ckp_id"))
        ev.join(broadcast(ckp))
          .filter($"us" > $"ckp_us" || ($"us" === $"ckp_us" && $"event_id" > $"ckp_id"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_after_ckp"), min($"us").as("first_us"))
          .orderBy($"event_type")
      },
      Some("""
        WITH ordered AS (
          SELECT event_type, event_id, epoch_us(ts) AS us,
                 ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rn
          FROM events),
        ckp AS (SELECT us AS ckp_us, event_id AS ckp_id FROM ordered WHERE rn = 5000)
        SELECT event_type, COUNT(*) AS n_after_ckp, MIN(us) AS first_us
        FROM ordered CROSS JOIN ckp
        WHERE us > ckp_us OR (us = ckp_us AND event_id > ckp_id)
        GROUP BY event_type ORDER BY event_type"""),
    ),

    QueryDef(
      "c03_table_filter_truthtable",
      (s, dir) => {
        import s.implicits._
        // db.table keys derived from documents.source; F1 semantics:
        // empty include-list ⇒ include, exclude overrides
        val keys = t(s, dir, "documents")
          .select(concat(lit("appdb."), $"source").as("table_key"))
          .distinct()
        keys
          .withColumn("inc_match", $"table_key".rlike("^appdb\\.src[0-9]+$"))
          .withColumn("exc_match", $"table_key".rlike("^.*\\.src1[0-9]$"))
          .withColumn("included", $"inc_match" && !$"exc_match")
          .orderBy($"table_key")
      },
      Some("""
        SELECT table_key,
               regexp_matches(table_key, '^appdb\.src[0-9]+$') AS inc_match,
               regexp_matches(table_key, '^.*\.src1[0-9]$') AS exc_match,
               regexp_matches(table_key, '^appdb\.src[0-9]+$')
                 AND NOT regexp_matches(table_key, '^.*\.src1[0-9]$') AS included
        FROM (SELECT DISTINCT 'appdb.' || source AS table_key FROM documents) x
        ORDER BY table_key"""),
    ),

    QueryDef(
      "c04_min_progress_across_sinks",
      (s, dir) => {
        import s.implicits._
        // each event_type plays the role of a sink; its checkpoint is the max
        // (us, event_id) it has processed; restart position = min over sinks
        val perSink = t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .groupBy($"event_type")
          .agg(max(struct($"us", $"event_id")).as("ckp"))
          .select($"event_type", $"ckp.us".as("ckp_us"), $"ckp.event_id".as("ckp_event_id"))
        val minP = perSink.agg(min(struct($"ckp_us", $"ckp_event_id")).as("m"))
          .select(lit("(min)").as("event_type"), $"m.ckp_us".as("ckp_us"),
            $"m.ckp_event_id".as("ckp_event_id"))
        perSink.unionAll(minP).orderBy($"event_type")
      },
      Some("""
        WITH per_sink AS (
          SELECT event_type, us AS ckp_us, event_id AS ckp_event_id FROM (
            SELECT event_type, epoch_us(ts) AS us, event_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events) x WHERE rn = 1)
        SELECT event_type, ckp_us, ckp_event_id FROM per_sink
        UNION ALL
        SELECT '(min)', ckp_us, ckp_event_id FROM (
          SELECT ckp_us, ckp_event_id,
                 ROW_NUMBER() OVER (ORDER BY ckp_us, ckp_event_id) AS rn
          FROM per_sink) y WHERE rn = 1
        ORDER BY event_type"""),
    ),

    // ---- c05: SCD Type-2 history — the versioned-dimension consumer ----
    // CurrentState (c01) is SCD Type 1: latest wins, history discarded.
    // The OTHER standard CDC consumer keeps every version with its
    // validity interval — (valid_from, valid_to, is_current) — so a join
    // "as of time T" picks the version that was live at T. Batch form:
    // each change's valid_to is simply the NEXT change's timestamp for
    // that key (lead), open-ended for the current version. One window
    // partitioned by the key — high-cardinality, skew-free, the
    // event-ordering guarantee (W1 strong total order per key) is what
    // makes lead() the correct closure rule. The streaming twin is
    // `streaming/ScdHistory`: the same intervals maintained incrementally
    // under foreachBatch with exactly-once replay (ScdHistorySpec locks
    // stream == this batch recompute).
    QueryDef(
      "c05_scd2_history",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"user_id", $"event_id", $"value", $"us".as("valid_from_us"),
            lead($"us", 1).over(w).as("valid_to_us"))
          .withColumn("is_current", $"valid_to_us".isNull)
          .orderBy($"user_id", $"valid_from_us", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, value, us AS valid_from_us,
               LEAD(us) OVER w AS valid_to_us,
               LEAD(us) OVER w IS NULL AS is_current
        FROM (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events) x
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, valid_from_us, event_id"""),
    ),

    // ---- c06: maintained changelog JOIN — the two-table CDC consumer ----
    // Two changelogs (left = click/view events, right = purchase/signup;
    // each event upserts its user's row, value < 1.0 is the tombstone)
    // joined into the materialized view L ⋈ R on user_id. This is the
    // semantics Structured Streaming's append-only stream-stream join
    // cannot express (no retractions); the streaming twin is
    // `streaming/IncrementalJoin` — a symmetric retraction-aware
    // maintainer whose final view IncrementalJoinSpec locks to THIS batch
    // recompute under any batch split of the ordered log. Batch shape:
    // two latest-per-key aggregates (max-struct, no window sort) and one
    // co-partitioned equi-join — each side shuffles once on user_id.
    QueryDef(
      "c06_changelog_join",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        def sideState(types: Seq[String]) =
          ev.filter($"event_type".isin(types: _*))
            .groupBy($"user_id")
            .agg(max(struct($"us", $"event_id", $"value")).as("m"))
            .select($"user_id", $"m.event_id".as("event_id"), $"m.value".as("value"))
            .filter($"value" >= 1.0)
        val l = sideState(Seq("click", "view"))
          .select($"user_id", $"event_id".as("l_event_id"), $"value".as("l_value"))
        val r = sideState(Seq("purchase", "signup"))
          .select($"user_id", $"event_id".as("r_event_id"), $"value".as("r_value"))
        l.join(r, Seq("user_id")).orderBy($"user_id")
      },
      Some("""
        WITH l AS (
          SELECT user_id, event_id AS l_event_id, value AS l_value
          FROM (SELECT user_id, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events WHERE event_type IN ('click','view')) x
          WHERE rn = 1 AND value >= 1.0),
        r AS (
          SELECT user_id, event_id AS r_event_id, value AS r_value
          FROM (SELECT user_id, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
                FROM events WHERE event_type IN ('purchase','signup')) y
          WHERE rn = 1 AND value >= 1.0)
        SELECT user_id, l_event_id, l_value, r_event_id, r_value
        FROM l JOIN r USING (user_id) ORDER BY user_id"""),
    ),

    // ---- c07: per-sink sequence-coverage audit — the T3 acceptance ----
    // ---- check as a batch report ----
    // Exactly-once delivery (T3 seq dedup) promises each sink a
    // duplicate-free, gap-explainable id stream. This is the audit that
    // VERIFIES it after the fact for one sink's delivered substream (the
    // 'click' sink — its event_id gaps are the ids other sinks consumed,
    // so the numbers are non-trivial): bucket the id space (div 1000),
    // and per bucket report delivered count, lo/hi, the missing-inside
    // count (span − delivered), and the gap to the previous bucket's hi.
    // Scale shape is the point: NO global sort over the stream — the
    // corpus-sized work is one map-side-combinable groupBy on the div
    // key; the lag() window then runs over the BUCKET frame (id-range /
    // 1000 rows, vanishingly small next to the stream), which is how a
    // 100 TB delivery log gets audited without ever ordering it.
    QueryDef(
      "c07_seq_coverage_audit",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"bucket")
        t(s, dir, "events")
          .filter($"event_type" === "click")
          .select(($"event_id" / 1000).cast("long").as("bucket"), $"event_id")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_delivered"),
            min($"event_id").as("lo"), max($"event_id").as("hi"))
          .withColumn("missing_inside", $"hi" - $"lo" + 1 - $"n_delivered")
          .withColumn("gap_before", $"lo" - lag($"hi", 1).over(w) - 1)
          .orderBy($"bucket")
      },
      Some("""
        WITH b AS (
          SELECT event_id // 1000 AS bucket, COUNT(*) AS n_delivered,
                 MIN(event_id) AS lo, MAX(event_id) AS hi
          FROM events WHERE event_type = 'click' GROUP BY 1)
        SELECT bucket, n_delivered, lo, hi,
               hi - lo + 1 - n_delivered AS missing_inside,
               lo - LAG(hi) OVER (ORDER BY bucket) - 1 AS gap_before
        FROM b ORDER BY bucket"""),
    ),

    // ---- c08: key-churn skew profile — write-load planning for a sink ----
    // The capacity question a CDC sink asks before choosing partitioning
    // and compaction cadence: how is the write load distributed over
    // primary keys? A log2-bucketed churn histogram (the t13
    // binary-width trick — ≤64 buckets at ANY key cardinality, so the
    // report never needs a rank/ntile window over the unbounded key
    // population) with per-bucket key counts, op totals, the hottest
    // key's op count, and each bucket's exact ppm share of total write
    // volume. A bucket holding few keys but a large ops_ppm IS the
    // hot-partition alarm (salt those keys / split their partitions).
    // Shape: one per-key hash-agg (map-side combinable), one ≤64-row
    // re-agg, one broadcast one-row grand total — integer-exact ppm by
    // integral division, no window, no self-join.
    QueryDef(
      "c08_key_churn",
      (s, dir) => {
        import s.implicits._
        val per = t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_ops"),
            countDistinct($"event_type").as("n_types"),
            (max($"us") - min($"us")).as("span_us"))
        val grand = per.agg(sum($"n_ops").as("grand"))
        per
          .withColumn("blen", length(bin($"n_ops")).cast("int"))
          .groupBy($"blen")
          .agg(count(lit(1)).as("n_keys"), sum($"n_ops").as("total_ops"),
            max($"n_ops").as("max_ops"), min($"span_us").as("min_span_us"))
          .crossJoin(broadcast(grand))
          .select($"blen",
            expr("shiftleft(1L, blen - 1)").as("bucket_lo"),
            expr("shiftleft(1L, blen) - 1L").as("bucket_hi"),
            $"n_keys", $"total_ops", $"max_ops", $"min_span_us",
            expr("total_ops * 1000000 div grand").as("ops_ppm"))
          .orderBy($"blen")
      },
      Some("""
        WITH per AS (
          SELECT user_id, COUNT(*) AS n_ops,
                 COUNT(DISTINCT event_type) AS n_types,
                 epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
          FROM events GROUP BY user_id),
        b AS (
          SELECT CAST(length(bin(n_ops)) AS INT) AS blen,
                 COUNT(*) AS n_keys, CAST(SUM(n_ops) AS BIGINT) AS total_ops,
                 CAST(MAX(n_ops) AS BIGINT) AS max_ops,
                 CAST(MIN(span_us) AS BIGINT) AS min_span_us
          FROM per GROUP BY 1),
        g AS (SELECT CAST(SUM(n_ops) AS BIGINT) AS grand FROM per)
        SELECT blen, CAST(1 << (blen - 1) AS BIGINT) AS bucket_lo,
               CAST((1 << blen) - 1 AS BIGINT) AS bucket_hi,
               n_keys, total_ops, max_ops, min_span_us,
               total_ops * 1000000 // grand AS ops_ppm
        FROM b CROSS JOIN g ORDER BY blen"""),
    ),

    // ---- c09: point-in-time reconstruction + drift vs current ----
    // The time-travel consumer the c-family was missing: "what did the
    // table look like AT position X, and which keys moved since" — the
    // audit a CDC sink answers for a consistency check or a backfill cut
    // (the reference's checkpointed positions make any X reproducible;
    // here X = the 3000th event by the W1 total order, derived exactly
    // like c02's checkpoint). AS-OF state is latest-per-key over ops
    // at-or-below X; drift compares it to c01's current state. Scale
    // shape: the cutoff row is TakeOrderedAndProject + a one-row
    // broadcast (never a global row_number over the stream); BOTH state
    // snapshots are sort-free max(struct) aggregates (partial-combined
    // per key — unlike a per-key window, nothing sorts the event
    // stream); the drift join is key-vs-key co-partitioned. Without
    // tombstones in the stand-in stream a key can never vanish, so the
    // statuses are created_since / advanced / unchanged.
    QueryDef(
      "c09_point_in_time",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events").withColumn("us", unix_micros($"ts"))
        val ckp = ev.select($"us", $"event_id")
          .orderBy($"us", $"event_id").limit(3000)
          .agg(max(struct($"us", $"event_id")).as("m"))
          .select($"m.us".as("ckp_us"), $"m.event_id".as("ckp_id"))
        def latest(df: org.apache.spark.sql.DataFrame) = df
          .groupBy($"user_id")
          .agg(max(struct($"us", $"event_id", $"event_type")).as("m"))
          .select($"user_id", $"m.event_id".as("eid"), $"m.event_type".as("etype"))
        val pit = latest(ev.join(broadcast(ckp))
          .filter($"us" < $"ckp_us" ||
            ($"us" === $"ckp_us" && $"event_id" <= $"ckp_id")))
          .select($"user_id", $"eid".as("pit_event_id"), $"etype".as("pit_type"))
        val now = latest(ev)
          .select($"user_id", $"eid".as("now_event_id"), $"etype".as("now_type"))
        now.join(pit, Seq("user_id"), "left")
          .select($"user_id", $"pit_event_id", $"pit_type",
            $"now_event_id", $"now_type",
            when($"pit_event_id".isNull, "created_since")
              .when($"pit_event_id" === $"now_event_id", "unchanged")
              .otherwise("advanced").as("status"))
          .orderBy($"user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        ordered AS (
          SELECT us, event_id,
                 ROW_NUMBER() OVER (ORDER BY us, event_id) AS rn
          FROM ev),
        ckp AS (
          -- least(3000, n): a stream shorter than the cut keeps its last
          -- event as the position, matching Spark's limit-then-max
          SELECT us AS ckp_us, event_id AS ckp_id FROM ordered
          WHERE rn = LEAST(3000, (SELECT MAX(rn) FROM ordered))),
        pit AS (
          SELECT user_id, event_id AS pit_event_id, event_type AS pit_type FROM (
            SELECT e.user_id, e.event_id, e.event_type,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id
                     ORDER BY e.us DESC, e.event_id DESC) AS rn
            FROM ev e CROSS JOIN ckp
            WHERE e.us < ckp_us OR (e.us = ckp_us AND e.event_id <= ckp_id)) x
          WHERE rn = 1),
        now_ AS (
          SELECT user_id, event_id AS now_event_id, event_type AS now_type FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY us DESC, event_id DESC) AS rn
            FROM ev) x
          WHERE rn = 1)
        SELECT n.user_id, p.pit_event_id, p.pit_type, n.now_event_id, n.now_type,
               CASE WHEN p.pit_event_id IS NULL THEN 'created_since'
                    WHEN p.pit_event_id = n.now_event_id THEN 'unchanged'
                    ELSE 'advanced' END AS status
        FROM now_ n LEFT JOIN pit p USING (user_id)
        ORDER BY n.user_id"""),
    ),
  )
}
