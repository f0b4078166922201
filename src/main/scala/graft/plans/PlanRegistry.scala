package graft.plans

import org.apache.spark.sql.SparkSession

/** Serializes every engine registration against a session's
  * `experimental` holder: `extraStrategies` / `extraOptimizations` are
  * plain mutable vars, so two threads first-touching different engine
  * entry points (Tables.t registering TopKStrategy, BucketRunningScan
  * registering its strategy) can interleave check-then-act and lose one
  * registration — leaving a custom logical node with no strategy and
  * failing planning at runtime in multi-threaded drivers. All engine
  * call sites route their read-modify-write through [[withLock]], keyed
  * on the session's own `experimental` instance. */
object PlanRegistry {
  def withLock[A](spark: SparkSession)(body: => A): A =
    spark.experimental.synchronized(body)
}
