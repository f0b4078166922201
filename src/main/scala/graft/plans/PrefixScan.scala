package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed prefix scan — a running LONG aggregate over a GLOBAL row
  * order without an unpartitioned window.
  *
  * The naive form, `agg.over(Window.orderBy(order))`, is the classic
  * scale trap: an unpartitioned window moves the ENTIRE input to one
  * task. A running aggregate over an associative op is instead the
  * textbook two-pass parallel scan, expressed here with a DETERMINISTIC
  * range bucketing so the two passes agree without sharing physical
  * partition state:
  *
  *   1. bucket every row by deterministic quantile boundaries of the
  *      leading order key (approxQuantile — Greenwald-Khanna, no
  *      sampling randomness; the boundary array is #buckets driver
  *      values, never corpus-sized). `spark_partition_id()` is
  *      deliberately NOT used: a range exchange re-samples bounds per
  *      materialization, so physical ids are not stable across the two
  *      passes that must agree (measured: the pid form returned wrong
  *      carries at sf0.01).
  *   2. hash-shuffle on the bucket + sort within partitions (the
  *      operator's ONE corpus-sized shuffle), then a per-partition
  *      imperative scan (`mapPartitions` — the one construct Spark has
  *      for a sequential carry) emits each row's within-bucket running
  *      value, resetting at bucket changes;
  *   3. fold each bucket to one aggregate row (map-side combine, read
  *      off the SCANNED side so the MapPartitions object barrier forces
  *      exchange reuse — see the inline note) and turn those into
  *      exclusive CARRY values with a window over #buckets rows —
  *      bounded by cluster size, never by data size;
  *   4. broadcast the carries back and combine: `out = carry ⊕ local`.
  *
  * Values are LongType (the engine's integer-exact currency); nulls are
  * ignored by the scan (a row before the first non-null carries null,
  * like the window form). The leading order column must be numeric and
  * non-null (it feeds the quantile bucketing); the full `order` must be
  * a TOTAL order (include a unique tie-break column) — the same
  * determinism requirement the window form has.
  *
  * CALLER CONTRACT, beyond the total order:
  *  - the input DataFrame must be DETERMINISTIC (no rand(), no fresh
  *    sampling): the carries subtree and the join subtree both consume
  *    `scanned`, and while the MapPartitions barrier makes the planner
  *    reuse the one exchange, exchange reuse is a runtime optimization
  *    (spark.sql.exchange.reuse) — if it is disabled or defeated, the
  *    two consumers recompute the lineage independently, and a
  *    non-deterministic source would hand them DIFFERENT rows (wrong
  *    carries). ENFORCED at runtime: an un-persisted input whose plan
  *    carries a non-deterministic expression is auto-persisted (logged);
  *    persist/unpersist it yourself to control the cache lifetime.
  *  - the quantile bucketing launches ONE extra job over the input
  *    before the main pass (approxQuantile), so an un-persisted input
  *    is scanned at least twice per call; the e31/e33 callers only
  *    avoid the double scan because Tables.t frames are session-cached.
  *    Persist (or pre-cache) the input when its lineage is expensive.
  *  - SKEWED LEADING KEYS are handled by a deterministic refinement:
  *    when the leading-key quantiles collapse onto a dominant value (a
  *    key carrying ≥2 buckets' worth of mass repeats in the quantile
  *    array), that key's rows are sub-bucketed by quantiles of the
  *    SECOND order column — boundaries become (key, tie) pairs compared
  *    lexicographically, so bucket ids stay monotone in the total order
  *    and the two passes still agree without any physical-partition
  *    state (still no `spark_partition_id`, still bit-identical to the
  *    window form). The refinement costs ONE extra scan of the input (a
  *    persisted two-column projection of the dominant keys' rows) plus
  *    up to 4 approxQuantile jobs over that cached projection — so a
  *    skewed un-persisted input is scanned at most three times per call
  *    (leading-key quantiles, refinement projection, main pass), never
  *    once per dominant value. Refinement is gated on the second order
  *    column's TYPE being numeric (a double cast of a non-numeric tie —
  *    e.g. a string — would not preserve its native sort order, and
  *    sub-bucketing by the cast while sorting natively would silently
  *    corrupt carries); with a single-column order or a non-numeric
  *    second column the dominant key degrades to the old one-big-bucket
  *    behavior — correct, but single-task-bounded, and logged.
  *
  * MEASURED BOUNDARY (PrefixScanBench, sf0.1 events = 600k rows, 32
  * threads, median-of-3 warm): window 0.298 s vs scan 1.116 s (same
  * split after the exchange-reuse fix) — at test SF the single-task
  * sort FITS one core and the scan pays the quantile job + the
  * exchange, so the operator is ~4× SLOWER there.
  * The crossover is memory, not speed: the window form funnels the
  * ENTIRE input through one task (at 100 TB that task simply dies),
  * while every stage here is bounded by 1/#buckets of the data — under
  * the non-skewed-leading-key condition in the caller contract above.
  * Use the window form for provably-bounded inputs (the ScaleShapeSpec
  * allow-list); use this for corpus-sized ones.
  */
object PrefixScan {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Running MAX of `value` over the global `order`, appended as `out`. */
  def runningMax(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame =
    scan(df, order, value, out, max, greatest(_, _), "max")

  /** Running SUM of `value` over the global `order`, appended as `out`. */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame =
    scan(df, order, value, out, sum, _ + _, "sum")

  /** Running MIN of `value` over the global `order`, appended as `out`. */
  def runningMin(df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame =
    scan(df, order, value, out, min, least(_, _), "min")

  /** Bucket boundaries for the two-pass scan: each is `(kb, None)` — the
    * bucket index increments where `k > kb` — or, for a DOMINANT leading
    * key (one that repeats in the leading-key quantile array, i.e.
    * carries ≥ 2 buckets' worth of mass), `(kb, Some(tb))` pairs from
    * quantiles of the second order column among that key's rows: the
    * index increments where `k > kb || (k == kb && t > tb)`. Indicators
    * are monotone in the (k, t) lexicographic order, so bucket ids stay
    * consistent with the total order — the carry combination is
    * unchanged. Exposed `private[plans]` for the skew spec. */
  private[plans] def boundariesFor(keyed: DataFrame, n: Int, k: String,
      k2: Option[String]): Seq[(Double, Option[Double])] = {
    val raw = keyed.stat
      .approxQuantile(k, (1 until n).map(_.toDouble / n).toArray, 0.001)
    val byValue = raw.groupBy(identity).toSeq.sortBy(_._1)
    // refine at most the 4 heaviest dominant values — enough for any real
    // skew profile, bounds the extra quantile jobs
    val refinable = byValue.filter(_._2.length >= 2)
      .sortBy(-_._2.length).take(4).map(_._1).toSet
    // ONE persisted two-column projection of the dominant keys' rows: the
    // per-value sub-quantile jobs scan THIS, not the full input lineage —
    // without it each refined value re-executed the un-persisted input,
    // turning the documented double scan into ~6 full scans on skewed data
    val dom =
      if (refinable.nonEmpty && k2.isDefined)
        Some(keyed.select(col(k), col(k2.get))
          .filter(col(k).isin(refinable.toSeq: _*)).persist())
      else None
    try byValue.flatMap { case (h, copies) =>
      val m = copies.length
      val sub: Seq[(Double, Option[Double])] =
        if (m >= 2 && refinable(h) && dom.isDefined)
          try {
            val q = dom.get.filter(col(k) === h).stat
              .approxQuantile(k2.get, (1 until m).map(_.toDouble / m).toArray, 0.001)
              .distinct.sorted.toSeq.map(t => (h, Some(t)))
            if (q.isEmpty)
              log.warn(s"PrefixScan skew refinement: tie column has no " +
                s"numeric values for dominant key $h — falling back to one " +
                "bucket for that key (exact, but single-task-bounded)")
            q
          } catch {
            case e: Exception => // non-numeric/all-null tie
              log.warn(s"PrefixScan skew refinement failed on the tie column " +
                s"for dominant key $h (${e.getMessage}) — falling back to one " +
                "bucket for that key (exact, but single-task-bounded)")
              Seq.empty
          }
        else Seq.empty
      if (sub.nonEmpty) sub
      else Seq((h, None)) // collapse duplicates like the old .distinct
    } finally dom.foreach(_.unpersist(false))
  }

  /** True when the plan's own expressions are all deterministic — the
    * replay-stability half of the caller contract, now ENFORCED at
    * runtime instead of scaladoc-only: the quantile job, the carries
    * subtree and the join subtree all consume the input, and if exchange
    * reuse is defeated a non-deterministic lineage hands them DIFFERENT
    * rows (wrong carries). Expression-level check (rand()/uuid()/
    * shuffle()…); it does not descend into subquery plans — the same
    * scope Catalyst's own `Expression.deterministic` governs. */
  private def hasNonDeterministicLineage(df: DataFrame): Boolean =
    df.queryExecution.analyzed.exists(p =>
      p.expressions.exists(e => e.exists(!_.deterministic)))

  private def scan(
      df0: DataFrame,
      order: Seq[Column],
      value: Column,
      out: String,
      agg: Column => Column,
      combine: (Column, Column) => Column,
      op: String): DataFrame = {
    // Caller-contract enforcement: a non-deterministic, un-persisted
    // input is auto-persisted so every consumer reads ONE materialization
    // (an already-persisted input is replay-stable as cached). The frame
    // stays cached for the session — persist/unpersist the input yourself
    // to control its lifetime.
    val df =
      if (df0.storageLevel == org.apache.spark.storage.StorageLevel.NONE &&
        hasNonDeterministicLineage(df0)) {
        log.warn("PrefixScan input has non-deterministic lineage " +
          "(rand()/uuid()/…): auto-persisting it so the scan's consumers " +
          "agree on one materialization — persist the input yourself to " +
          "control the cache lifetime")
        df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      } else df0
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val k = "__ps_k"
    val k2 = "__ps_k2"
    val bkt = "__ps_bkt"
    val v = "__ps_v"
    val local = "__ps_local"
    // The tie column is OPTIONAL refinement input, and refinement is only
    // SOUND when the double cast preserves the tie's own sort order — true
    // for numeric types, FALSE for strings ("10" < "2" lexicographically
    // but 10.0 > 2.0 numerically: sub-bucketing a castable string tie by
    // its numeric value would silently produce wrong carries while the
    // in-bucket sort stays lexicographic). So the refinement leg is gated
    // on the tie's TYPE, not on cast success: non-numeric ties degrade to
    // the unrefined dominant bucket (exact, single-task-bounded, logged).
    val tieNumeric = order.length >= 2 && {
      val dt = df.select(order(1)).schema.head.dataType
      dt.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    if (order.length >= 2 && !tieNumeric)
      log.warn("PrefixScan skew refinement disabled: the second order " +
        "column is non-numeric (double-cast order would diverge from its " +
        "native sort order) — dominant keys fall back to one bucket each")
    val keyed0 = df
      .withColumn(k, order.head.cast("double")) // contract: numeric — fail loudly
      .withColumn(v, value.cast(LongType))
    val keyed = if (tieNumeric) keyed0.withColumn(k2, order(1).cast("double"))
      else keyed0
    // Deterministic bucket boundaries: O(#buckets) driver doubles.
    val bounds = boundariesFor(keyed, n, k, if (tieNumeric) Some(k2) else None)
    val bucket = bounds.foldLeft(lit(0)) {
      case (acc, (kb, None)) =>
        acc + when(col(k) > kb, 1).otherwise(0)
      case (acc, (kb, Some(tb))) =>
        acc + when(col(k) > kb || (col(k) === kb && col(k2) > tb), 1).otherwise(0)
    }.cast(IntegerType)
    val ranged = keyed
      .withColumn(bkt, bucket)
      .repartition(n, col(bkt))
      .sortWithinPartitions(col(bkt) +: order: _*)
    // The carry pass runs as the native InternalRow operator
    // (BucketRunningScan) — the Dataset.mapPartitions form paid a full
    // Row-encoder round trip (deserialize → Seq append → re-encode) PER
    // ROW, and the scan covers the whole input twice per query (carries
    // subtree + join subtree). Same algorithm, same object barrier
    // against column pruning (exchange reuse still holds).
    val scanned = BucketRunningScan.append(ranged, bkt, v, local, op)
    // Exclusive per-bucket carries: #buckets rows end-to-end. Derived
    // from `scanned`, NOT from `ranged` — column pruning pushes below a
    // plain aggregate and produces a narrower (different) exchange
    // subtree, so a carries-from-ranged plan re-scans and re-shuffles
    // the whole corpus (observed in e31's explain). The MapPartitions
    // object barrier blocks pruning, so both consumers read the ONE
    // exchange (ReusedExchange) and the corpus moves exactly once.
    val carries = scanned.groupBy(col(bkt)).agg(agg(col(v)).as("pagg"))
      .withColumn("__ps_carry",
        agg(col("pagg")).over(
          Window.orderBy(col(bkt)).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(bkt), col("__ps_carry"))
    scanned
      .join(broadcast(carries), Seq(bkt), "left")
      .withColumn(out,
        when(col("__ps_carry").isNull, col(local))
          .otherwise(when(col(local).isNull, col("__ps_carry"))
            .otherwise(combine(col("__ps_carry"), col(local)))))
      .drop(bkt, k, k2, v, local, "__ps_carry")
  }
}
