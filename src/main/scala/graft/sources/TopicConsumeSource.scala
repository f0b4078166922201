package graft.sources

import graft.cdc.{OperationDecoder, TopicLike}
import graft.streaming.OperationJson
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** `format("graft-topic")` — the CONSUMER side of the wire protocol as a
  * first-class Spark streaming source: the reference ships a Kafka client
  * library (sink/kafka/client/go/decoder.go — seq dedup, fragment
  * reassembly, payload decode) that downstream consumers embed; this is
  * that library as a DSv2 `MicroBatchStream`, so a downstream Spark
  * pipeline runs `readStream.format("graft-topic").option("addr", …)` and
  * gets the decoded operation stream with the protocol's exactly-once
  * contract held across RESTARTS: the checkpointed offset carries
  * (next raw message offset, last commit seq, op count), a fresh run
  * re-arms the decoder at that seq floor and resumes the fetch after the
  * last commit — the same resume rule as the reference client.
  *
  * `addr` accepts every served dialect ([[TopicLike.connect]]):
  * `kafka://host:port/topic`, `kafka2://host:port/topic`, or `host:port`
  * (TopicSim). Ordering: the topic IS the W1 total order, so the source
  * plans ONE partition per micro-batch — order-preserving by
  * construction, like the reference consumer (parallelism belongs to the
  * ANALYTICS after the decode, not to the ordered protocol scan; the
  * driver-side feed is the same handoff the binlog-live source makes).
  * Fragment groups that straddle a poll boundary are held in the
  * decoder's state and complete on the next poll — micro-batch boundaries
  * only ever land on fragment-GROUP boundaries (the producer's trx split
  * points; a torn group never half-emits). At 100 TB
  * against real Kafka, the drop-in is Spark's kafka connector feeding the
  * same [[OperationDecoder]] stage; this source is the protocol-complete
  * twin for the engine's own served-topic wire.
  */
class TopicConsumeSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicConsumeSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TopicConsumeTable(new CaseInsensitiveStringMap(properties))
}

object TopicConsumeSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("op_idx", LongType, nullable = false),
    StructField("commit_seq", LongType, nullable = false),
    StructField("commit_offset", LongType, nullable = false),
    StructField("op_json", StringType, nullable = false)))
}

class TopicConsumeTable(opts: CaseInsensitiveStringMap) extends Table with SupportsRead {
  require(opts.get("addr") != null, "graft-topic requires option 'addr'")
  override def name(): String = s"graft-topic(${opts.get("addr")})"
  override def schema(): StructType = TopicConsumeSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TopicConsumeSource.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TopicConsumeMicroBatchStream(opts.get("addr"),
          Option(opts.get("maxOpsPerTrigger")).map(_.toLong))
      // batch form: `spark.read.format("graft-topic")` — the recovery
      // scan as a DataFrame. Unlike the streaming path (driver-side feed,
      // the ordered-protocol handoff), the batch scan runs ON AN EXECUTOR:
      // the partition carries only (addr, fromSeq) and the reader
      // connects/fetches/decodes there, so the driver never holds the
      // topic. One partition — the topic IS the W1 total order and the
      // seq-dedup decode is inherently sequential; parallelism belongs to
      // the analytics after this scan.
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        new org.apache.spark.sql.connector.read.Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(TopicBatchScan(opts.get("addr"),
              Option(opts.get("fromSeq")).map(_.toLong).getOrElse(0L),
              Option(opts.get("pageSize")).map(_.toInt).getOrElse(512)))
          override def createReaderFactory(): PartitionReaderFactory =
            new TopicBatchReaderFactory
        }
    }
}

/** Batch-scan partition: everything the executor needs to consume the
  * whole topic (connection address + seq-dedup floor + fetch page size). */
final case class TopicBatchScan(addr: String, fromSeq: Long, pageSize: Int = 512)
    extends InputPartition

class TopicBatchReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TopicBatchScan]
    new PartitionReader[InternalRow] {
      private val client = TopicLike.connect(p.addr)
      private val decoder = new OperationDecoder(lastCommitSeq = p.fromSeq)
      // Paged drain, NOT one fetchFrom(0): a long-retained topic would
      // otherwise materialize whole into the reader's heap before the
      // first row is served. Each fetchPage round holds at most pageSize
      // raw messages; the scan is bounded by the high-water mark observed
      // at open (the streaming poll's entry-hwm invariant) and messages
      // AT OR PAST the entry hwm are dropped even when they ride the
      // final fetched page: a concurrent producer's tail belongs to a
      // later scan, and — the reason the filter is strict — a RETRIED
      // task opens a fresh reader with a fresh (higher) hwm, so serving
      // the observed tail would make the retry return a different row
      // set than the original attempt for the same partition.
      private val entryHwm = client.highWaterMark()
      private val raw: Iterator[(Long, Array[Byte])] = new Iterator[(Long, Array[Byte])] {
        private var nextOffset = 0L
        private var page: Vector[(Long, Array[Byte])] = Vector.empty
        private var i = 0
        private def refill(): Unit =
          while (i >= page.length && nextOffset < entryHwm) {
            page = client.fetchPage(nextOffset, p.pageSize).filter(_._1 < entryHwm)
            i = 0
            // an empty page below the hwm is a retention gap tail: done
            nextOffset = if (page.isEmpty) entryHwm else page.last._1 + 1
          }
        override def hasNext: Boolean = { refill(); i < page.length }
        override def next(): (Long, Array[Byte]) = { refill(); val m = page(i); i += 1; m }
      }
      private val it = raw.flatMap { case (off, bytes) =>
        decoder.feed(bytes, off).toSeq.flatMap(b =>
          b.ops.map(op => (b.commitSeq, b.commitOffset, OperationJson.render(op))))
      }.zipWithIndex
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val ((seq, off, json), idx) = it.next()
          cur = new GenericInternalRow(Array[Any](idx.toLong, seq, off,
            UTF8String.fromString(json)))
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit =
        try client.close() catch { case _: Exception => () }
    }
  }
}

/** (next raw message offset, decoder seq floor, ops emitted so far) —
  * always aligned to a COMMIT boundary. */
final case class TopicOffset(msgOffset: Long, commitSeq: Long, opIdx: Long)
    extends Offset {
  override def json(): String =
    s"""{"msg_offset":$msgOffset,"commit_seq":$commitSeq,"op_idx":$opIdx}"""
}

object TopicOffset {
  val zero: TopicOffset = TopicOffset(0L, 0L, 0L)
  private val P = """\{"msg_offset":(-?\d+),"commit_seq":(-?\d+),"op_idx":(-?\d+)\}""".r
  def fromJson(s: String): TopicOffset = s match {
    case P(m, c, o) => TopicOffset(m.toLong, c.toLong, o.toLong)
    case _ => throw new IllegalArgumentException(s"bad topic offset: $s")
  }
}

class TopicConsumeMicroBatchStream(addr: String,
    maxOpsPerTrigger: Option[Long] = None,
    pollPage: Int = 512) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  // Driver-side consume state (the LiveBinlogFeed pattern): the decoder
  // holds cross-poll fragment state; `buffer` holds decoded ops not yet
  // committed by Spark, indexed from `baseIdx`. `safeMsgOffset` trails
  // `nextMsgOffset` when a fragment group is torn across the poll
  // boundary: every offset REPORTED to Spark uses the safe value (the
  // torn group's head), so a restart refetches the whole group instead
  // of hitting a seq gap on its tail. `boundaries` records one
  // checkpointable offset per completed group — admission control caps
  // batches only at group boundaries for the same reason.
  private var client: TopicLike = _
  private var decoder: OperationDecoder = _
  private var nextMsgOffset = 0L
  private var safeMsgOffset = 0L
  private var commitSeq = 0L
  private var baseIdx = 0L // op_idx of buffer.head
  private var armedAt: Option[TopicOffset] = None
  private var polled = false
  private val buffer =
    scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
  private val boundaries =
    scala.collection.mutable.ArrayBuffer.empty[TopicOffset]

  /** (Re)arm the consume state at a checkpointed offset — called lazily
    * from the offsets Spark hands us. On a WAL replay Spark can
    * deserialize the last batch's START and END in either order; until
    * the first poll the feed re-arms at the SMALLEST offset seen (a
    * replayed committed-but-unprocessed batch must be re-consumable), and
    * after that a rewind below the buffer base is a hard error. */
  private def arm(at: TopicOffset): Unit = synchronized {
    if (armedAt.contains(at)) return
    if (armedAt.isEmpty || (!polled && at.opIdx < armedAt.get.opIdx)) {
      if (client != null) try client.close() catch { case _: Exception => () }
      buffer.clear()
      boundaries.clear()
      client = TopicLike.connect(addr)
      decoder = new OperationDecoder(lastCommitSeq = at.commitSeq)
      nextMsgOffset = at.msgOffset
      safeMsgOffset = at.msgOffset
      commitSeq = at.commitSeq
      baseIdx = at.opIdx
      armedAt = Some(at)
    } else require(at.opIdx >= baseIdx,
      s"cannot rewind a live consume feed to $at (base $baseIdx)")
  }

  /** Buffered-but-uncommitted op count — exposed for the bounded-poll
    * driver-memory spec. */
  private[sources] def bufferedOps: Int = synchronized(buffer.size)

  /** Drain the broker in BOUNDED `fetchPage` rounds, stopping once a group
    * boundary at/past `untilOpIdx` is buffered (or the high-water mark is
    * reached). With admission control the budget is start + maxRows, so
    * driver memory stays proportional to the trigger size — a restart
    * against a long-retained topic no longer materializes the whole
    * backlog into the buffer to serve one capped batch. `Long.MaxValue`
    * (allAvailable) keeps the old drain-to-hwm behavior, which is then the
    * batch size by definition. */
  private def poll(untilOpIdx: Long): Unit = synchronized {
    polled = true
    // Bound the drain at the hwm observed ON ENTRY: against a continuously
    // producing topic the page loop would otherwise chase the tail forever
    // (fetchPage never comes back empty while the producer outruns the
    // fetch round-trip), holding the stream's monitor and growing the
    // buffer without bound — the same first-response-hwm invariant
    // KafkaTopicClient.fetchFrom documents for the recovery scan.
    val hwm = client.highWaterMark()
    // log-start probed at most once per poll: it only moves forward, so a
    // value <= nextMsgOffset proves every later gap in this drain benign
    // without an extra round trip per gap-straddling page
    var logStart = -1L
    var caughtUp = nextMsgOffset >= hwm
    while (!caughtUp &&
        !(boundaries.nonEmpty && boundaries.last.opIdx >= untilOpIdx)) {
      val msgs = client.fetchPage(nextMsgOffset, pollPage)
      if (msgs.isEmpty) caughtUp = true
      else {
        // A page whose head is beyond the requested offset is a retention
        // purge ONLY if the broker's log-start moved past the checkpoint;
        // a real Kafka log also has benign offset gaps (compaction,
        // transaction control records) that must NOT kill a healthy stream.
        if (msgs.head._1 > nextMsgOffset && {
              if (logStart < 0) logStart = client.logStartOffset()
              logStart > nextMsgOffset
            })
          throw new IllegalStateException(
            s"topic retention purged offsets < ${msgs.head._1}: the consume " +
              s"checkpoint needs message $nextMsgOffset, which the broker no " +
              "longer retains; this checkpoint is unrecoverable — restart " +
              "from a fresh checkpoint at the earliest retained offset (and " +
              "re-bootstrap downstream state), or raise the topic retention")
        msgs.foreach { case (off, bytes) =>
          decoder.feed(bytes, off).foreach { b =>
            b.ops.foreach { op =>
              buffer += ((baseIdx + buffer.size, b.commitSeq, b.commitOffset,
                OperationJson.render(op)))
            }
            commitSeq = b.commitSeq
            safeMsgOffset = off + 1
            boundaries += TopicOffset(safeMsgOffset, commitSeq, baseIdx + buffer.size)
          }
          nextMsgOffset = off + 1
        }
        // pages bound the drain at THIS poll's hwm, to within the final
        // page: messages a concurrent producer appended past the entry hwm
        // that ride that page are kept (they were already fetched —
        // re-fetching them next trigger would waste the wire round), so the
        // bound is hwm + at most one page, never unbounded chase
        if (nextMsgOffset >= hwm) caughtUp = true
      }
    }
  }

  /** The checkpointable high-water mark: always a group boundary. */
  private def safeLatest: TopicOffset =
    TopicOffset(safeMsgOffset, commitSeq, baseIdx + buffer.size)

  override def initialOffset(): Offset = {
    arm(TopicOffset.zero)
    TopicOffset.zero
  }

  override def latestOffset(): Offset = synchronized {
    // Spark calls deserializeOffset(checkpoint) then latestOffset on a
    // restarted query; arming is idempotent and deserializeOffset arms.
    if (armedAt.isEmpty) arm(TopicOffset.zero)
    poll(Long.MaxValue)
    safeLatest
  }

  override def getDefaultReadLimit: ReadLimit =
    maxOpsPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  /** Rate-limited form: caps the batch at the largest GROUP boundary
    * within the row budget (a mid-group offset would not be a replayable
    * checkpoint); if even the first pending group exceeds the budget it
    * is taken whole — one group is the progress quantum. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    if (armedAt.isEmpty) arm(start.asInstanceOf[TopicOffset])
    val s = start.asInstanceOf[TopicOffset].opIdx
    limit match {
      case mr: ReadMaxRows =>
        val budget = s + mr.maxRows
        poll(budget) // bounded: stop at the first boundary at/past the budget
        val within = boundaries.filter(b => b.opIdx > s && b.opIdx <= budget)
        if (within.nonEmpty) within.last
        else boundaries.find(_.opIdx > s).getOrElse(safeLatest)
      case _ =>
        poll(Long.MaxValue)
        safeLatest
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val o = TopicOffset.fromJson(json)
    arm(o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffset].opIdx
    val e = end.asInstanceOf[TopicOffset].opIdx
    val slice = synchronized {
      // Restart replay: Spark re-runs a committed-to-the-offset-log batch
      // straight through planInputPartitions — constructNextBatch (and so
      // latestOffset/poll) is SKIPPED for a recovered batch. The buffer is
      // empty then; refetch from the armed checkpoint (the topic retains
      // the messages) so the replayed batch carries its original rows
      // instead of silently committing empty and shifting every later
      // op_idx.
      if (e - baseIdx > buffer.size) poll(e)
      if (!(s >= baseIdx && e - baseIdx <= buffer.size)) {
        // Coverage failure after a refetch usually means the broker no
        // longer holds the checkpointed range (retention purge, or the
        // topic was truncated/recreated shorter than the checkpoint).
        val hwm = try client.highWaterMark() catch { case _: Exception => -1L }
        if (hwm >= 0 && hwm < nextMsgOffset)
          throw new IllegalStateException(
            s"topic retention purged the checkpointed range: replaying batch " +
              s"[$s,$e) needs messages from offset $safeMsgOffset but the " +
              s"broker's high-water mark is $hwm (topic truncated or " +
              "recreated); this checkpoint is unrecoverable — restart from a " +
              "fresh checkpoint and re-bootstrap downstream state")
        throw new IllegalStateException(
          s"batch [$s,$e) not coverable from base $baseIdx + ${buffer.size} buffered ops")
      }
      buffer.slice((s - baseIdx).toInt, (e - baseIdx).toInt).toVector
    }
    Array(TopicSlice(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory = new TopicReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[TopicOffset].opIdx
    val drop = (upTo - baseIdx).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseIdx = upTo }
    boundaries.filterInPlace(_.opIdx > upTo)
  }

  override def stop(): Unit = synchronized {
    if (client != null) try client.close() catch { case _: Exception => () }
  }
}

final case class TopicSlice(ops: Vector[(Long, Long, Long, String)])
    extends InputPartition

class TopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[TopicSlice].ops.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (idx, seq, off, json) = it.next()
          cur = new GenericInternalRow(Array[Any](idx, seq, off,
            UTF8String.fromString(json)))
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
