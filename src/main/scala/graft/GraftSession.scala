package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder pre-configured with the
  * settings every deployment of this engine wants, so `GraftSession.builder()
  * .master(...).getOrCreate()` is a correct starting point at any scale.
  *
  * What it sets and why:
  *  - `spark.sql.extensions=graft.GraftExtensions` — the native functions
  *    (`word_ngrams`, `winnow_fingerprints`, `long_dot`, `interleave_bits`,
  *    `char_entropy`)
  *    registered in every session, SQL and DataFrame alike.
  *  - `spark.sql.session.timeZone=UTC` — all engine time arithmetic is
  *    epoch-exact; a session-local zone silently shifts window boundaries.
  *  - AQE on with coalescing and skew-join handling — runtime re-planning
  *    is the 100 TB default: post-shuffle partition sizing and skew splits
  *    need runtime statistics, not static guesses.
  *  - `spark.sql.shuffle.partitions` — caller-provided (defaults to 2×
  *    cores locally): the one knob with no universal value; the builder
  *    takes it as a parameter instead of hardcoding 200.
  *  - Parquet nanos-as-long — TIMESTAMP(NANOS) inputs (the events table;
  *    any nano-precision producer) read as exact longs instead of failing
  *    the vectorized reader.
  *
  * Callers can override anything afterwards — these are defaults, not
  * policy.
  */
object GraftSession {

  def builder(shufflePartitions: Int = 2 * Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
