package graft.metrics

import java.util.concurrent.atomic.AtomicLong
import scala.collection.immutable.ListMap

/** A1 — pipeline counters with Prometheus text exposition
  * (/root/reference/cmd/dolphinbeat/metrics.go:29-51: trx_total, iud_total,
  * ddl_total, failed_ddl_total). No client library: the exposition format
  * is a stable public text format, and counters are monotonic longs.
  *
  * Extra graft-side counters cover what the reference exposes through its
  * run stats: emitted/dropped operations, produced wire messages, and the
  * Structured Streaming bridge (input rows / batches via
  * [[GraftStreamingListener]]).
  */
final class Counters {
  final class C(val name: String, val help: String) {
    private val v = new AtomicLong()
    def inc(): Unit = v.incrementAndGet()
    def add(n: Long): Unit = v.addAndGet(n)
    def get: Long = v.get()
  }

  val trxTotal = new C("trx_total", "Counter of transactions handled.")
  val iudTotal = new C("iud_total", "Counter of insert/update/delete events handled.")
  val ddlTotal = new C("ddl_total", "Counter of DDL handled.")
  val failedDdlTotal = new C("failed_ddl_total", "Counter of failed DDL.")
  val opsEmittedTotal = new C("ops_emitted_total", "Operations emitted to sinks.")
  val opsDroppedTotal = new C("ops_dropped_total", "Operations dropped as restart duplicates.")
  val wireMessagesTotal = new C("wire_messages_total", "Wire-protocol messages produced.")
  val streamInputRowsTotal = new C("stream_input_rows_total", "Rows entering streaming queries.")
  val streamBatchesTotal = new C("stream_batches_total", "Micro-batches completed.")

  def all: Seq[C] = Seq(trxTotal, iudTotal, ddlTotal, failedDdlTotal, opsEmittedTotal,
    opsDroppedTotal, wireMessagesTotal, streamInputRowsTotal, streamBatchesTotal)

  /** Prometheus text exposition format (text/plain; version=0.0.4). */
  def prometheusText: String = {
    val sb = new StringBuilder
    all.foreach { c =>
      sb.append("# HELP ").append(c.name).append(' ').append(c.help).append('\n')
      sb.append("# TYPE ").append(c.name).append(" counter\n")
      sb.append(c.name).append(' ').append(c.get).append('\n')
    }
    sb.toString
  }

  def snapshot: Map[String, Long] = ListMap(all.map(c => c.name -> c.get): _*)
}

/** The Structured Streaming → metrics bridge: every completed micro-batch
  * feeds the counters, so /metrics reflects live query progress the way the
  * reference's prometheus collectors reflect its canal counters. Attach
  * with `spark.streams.addListener(new GraftStreamingListener(counters))`. */
final class GraftStreamingListener(counters: Counters)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    counters.streamInputRowsTotal.add(event.progress.numInputRows)
    counters.streamBatchesTotal.inc()
  }
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
