package graft.streaming

import graft.cdc._
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The change-stream pipeline: an ordered `Dataset[OpEnvelope]` flowing
  * source → global filter (F1) → per-sink filter (F2) + restart dedup (F3)
  * → sinks, exactly the reference's fixed topology
  * (/root/reference/canal/sync.go event loop → handler_mux → sinks).
  *
  * Ordering model (SURVEY.md §2.5 W1): binlog protocol parsing is inherently
  * single-stream — the source threads rotate/server_id state sequentially
  * and stamps a monotonic seqNo; everything downstream (filters, dedup,
  * encode) is per-event pure and runs distributed, with order restored
  * per-sink by seqNo. At 100 TB the CDC path stays a thin ordered stream
  * while the heavy analytics fan out from materialized tables.
  */
object ChangeStream {

  /** Source envelope: seqNo = arrival order; logName threaded from rotate
    * events (the HandlerMux's mux-wide (serverID, logName) state,
    * /root/reference/canal/handler_mux.go:105-246). */
  final case class OpEnvelope(seqNo: Long, logName: String, op: Operation)

  implicit val opEnc: Encoder[Operation] = Encoders.kryo[Operation]
  implicit val envEnc: Encoder[OpEnvelope] = Encoders.kryo[OpEnvelope]

  /** Thread rotate state through an ordered operation iterator (driver/source
    * side — the single-threaded syncer loop analogue). */
  def threadLogNames(ops: Iterator[Operation], initialLogName: String = ""): Iterator[OpEnvelope] = {
    var logName = initialLogName
    var seq = 0L
    ops.map { op =>
      if (op.opType == OpType.Rotate) logName = op.nextLogName.getOrElse(logName)
      seq += 1
      OpEnvelope(seq, logName, op)
    }
  }

  /** F1 — global include/exclude on row events; marker ops pass through
    * (the canal filters before row decode, /root/reference/canal/canal.go:328-335). */
  def globalFilter(ds: Dataset[OpEnvelope], includes: Seq[String], excludes: Seq[String]): Dataset[OpEnvelope] = {
    val f = CanalTableFilter(includes, excludes)
    ds.filter { e =>
      e.op.table match {
        case Some(t) => f.matches(t.database, t.name)
        case None => true
      }
    }
  }

  /** F2 — per-sink ignore filter (different truth table than F1,
    * /root/reference/canal/handler_mux.go:49-78). */
  def sinkFilter(ds: Dataset[OpEnvelope], includes: Seq[String], excludes: Seq[String]): Dataset[OpEnvelope] = {
    val f = SinkTableFilter(includes, excludes)
    ds.filter { e =>
      e.op.table match {
        case Some(t) => !f.isIgnored(t.database, t.name)
        case None => true
      }
    }
  }

  /** F3 — restart dedup against a sink's checkpointed progress. Stateless
    * per-event (position ≤ checkpoint within the same server_id ⇒ drop), so
    * it distributes; the catch-up latch of the reference is an optimization
    * this pure form doesn't need. */
  def dedupBelowCheckpoint(ds: Dataset[OpEnvelope], ckp: Progress): Dataset[OpEnvelope] = {
    if (ckp.isZero) ds
    else ds.filter { e =>
      if (e.logName.isEmpty) true // pre-rotate event: position UNKNOWN —
      // "" sorts below every real binlog name, so comparing would
      // silently drop genuine post-checkpoint events; pass through and
      // let the seq/trx dedup layers handle any true duplicate
      else {
        val pos = Position(e.logName, e.op.header.logPos, e.op.header.serverId)
        if (pos.serverId != ckp.pos.serverId) true // failover: treat as new
        else pos.compare(ckp.pos) > 0
      }
    }
  }

  /** Transaction batch emitted by the stateful grouper. */
  final case class TrxBatch(ops: Vector[Operation])
  implicit val batchEnc: Encoder[TrxBatch] = Encoders.kryo[TrxBatch]
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  private implicit val stateEnc: Encoder[Vector[Operation]] = Encoders.kryo[Vector[Operation]]

  /** W3 — BEGIN..COMMIT sessionization by delimiter events, as a Structured
    * Streaming stateful operator (flatMapGroupsWithState keyed by server_id;
    * time-based session_window is the WRONG tool — grouping is delimiter-based,
    * /root/reference/sink/kafka/kafka.go:294-336). */
  def transactions(ds: Dataset[OpEnvelope]): Dataset[TrxBatch] = {
    ds.groupByKey(_.op.header.serverId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[OpEnvelope], state: GroupState[Vector[Operation]]) => {
          var buf = state.getOption.getOrElse(Vector.empty)
          val out = Vector.newBuilder[TrxBatch]
          it.toVector.sortBy(_.seqNo).foreach { e =>
            buf :+= e.op
            val isBarrier = e.op.opType == OpType.Commit ||
              e.op.opType == OpType.Ddl || e.op.opType == OpType.Rotate
            if (isBarrier) {
              out += TrxBatch(buf)
              buf = Vector.empty
            }
          }
          state.update(buf)
          out.result().iterator
        })
  }
}
