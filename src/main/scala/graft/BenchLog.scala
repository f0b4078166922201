package graft

/** Log hygiene for the benchmark/verify mains.
  *
  * Every WindowExec "No Partition Defined" warning the r8 bench tail
  * drowned in comes from a PROVABLY bounded frame (≤64 histogram buckets,
  * top-k lists, #languages/#sources) — `ScaleShapeSpec` pins that every
  * unpartitioned window in every declared plan sits over a bounded input,
  * and that spec (not this logger rule) remains the structural guard
  * against a real corpus-sized single-partition window sneaking in. The
  * artifact problem is separate: ~200 identical warnings per run made the
  * bench tail unreadable, so a genuine regression's warning would drown.
  * Raising the WindowExec logger to ERROR in the measurement mains keeps
  * the artifact readable; tests and non-bench entry points keep the
  * default level.
  */
object BenchLog {
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
