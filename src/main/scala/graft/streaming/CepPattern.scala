package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CEP — the arrival-time twin of batch e24 (strict-contiguity
  * pattern counts), with the state representation that makes CEP viable on
  * an unbounded stream: NOT a buffered timeline (a user who clicks forever
  * would grow it without bound) but the DFA REGISTERS of each pattern —
  * O(1) per user regardless of history.
  *
  *  - conversion machine (`vc*p`): one bit — "armed" = the suffix since
  *    the last non-click after a view is `v c*`; a `p` while armed
  *    completes a match (then idle: non-overlapping, exactly the regex
  *    scan's restart), any other event disarms;
  *  - burst machine (`ee+`): two bits — previous event was an error /
  *    current maximal error run already counted.
  *
  * Equivalence with the batch operator's non-overlapping leftmost regex
  * scan is exact for these alternation-free patterns (CepPatternSpec
  * proves stream == batch e24 on boundary-crossing fixtures), which is
  * the point: the same declared pattern answered incrementally with
  * constant state.
  *
  * Ordering contract (the IngestQuota/ScdHistory contract): within a
  * micro-batch a user's events are processed in (event-time, event_id)
  * order; across batches the micro-batch sequence is the arrival order,
  * so a source must deliver each user's events in event-time order
  * batch-over-batch (a binlog replay and a sessionized feed both do).
  * Out-of-order delivery needs a watermark-buffering front like
  * EventTimeWindows composed in front of this operator.
  *
  * Scale: one hash exchange on user_id (the exchange every stateful
  * per-key operator pays), state = 5 small registers per user, emission =
  * one cumulative row per TOUCHED user per batch (Update-style deltas —
  * downstream upserts by user_id).
  */
object CepPattern {

  /** DFA registers — the whole per-user state. */
  final case class Registers(armed: Boolean, prevError: Boolean,
      burstCounted: Boolean, nEvents: Long, nConv: Long, nBursts: Long)

  private val Init = Registers(
    armed = false, prevError = false, burstCounted = false, 0L, 0L, 0L)

  private[streaming] def step(r: Registers, ch: String): Registers = {
    val c1 = ch match {
      case "v" => r.copy(armed = true)
      case "c" => r // armed survives clicks, idle stays idle
      case "p" =>
        if (r.armed) r.copy(armed = false, nConv = r.nConv + 1)
        else r
      case _ => r.copy(armed = false)
    }
    val c2 = ch match {
      case "e" =>
        if (c1.prevError && !c1.burstCounted)
          c1.copy(burstCounted = true, nBursts = c1.nBursts + 1)
        else c1.copy(prevError = true)
      case _ => c1.copy(prevError = false, burstCounted = false)
    }
    c2.copy(nEvents = c2.nEvents + 1)
  }

  /** Maintain cumulative pattern counts over a stream with columns
    * (user_id, ts, event_id, event_type). Emits one row per touched user
    * per micro-batch: (user_id, n_events, n_conv, n_error_bursts) —
    * cumulative, so the LAST row per user equals the batch e24 answer
    * over everything delivered so far. */
  def counts(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("us"),
        col("event_id").cast("long"),
        substring(col("event_type"), 1, 1).as("ch"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Registers]) =>
          val ordered = rows.toArray.sortBy(r => (r._2, r._3))
          val r = ordered.foldLeft(state.getOption.getOrElse(Init)) {
            (acc, row) => step(acc, row._4)
          }
          state.update(r)
          Iterator.single((user, r.nEvents, r.nConv, r.nBursts))
      }
      .toDF("user_id", "n_events", "n_conv", "n_error_bursts")
  }

  /** Run over a stream; each micro-batch's touched-user rows go to `sink`. */
  def start(stream: DataFrame, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    counts(stream).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(batch.toDF(), id)
      }
      .start()
}
