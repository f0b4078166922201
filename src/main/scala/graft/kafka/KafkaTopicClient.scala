package graft.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

import graft.cdc.TopicLike
import KafkaWire._

/** The Kafka-protocol implementation of the sink's topic surface
  * ([[graft.cdc.TopicLike]]): one persistent connection, sequential
  * request/response with correlation-id checking, and exactly the three
  * operations the K1 lifecycle uses —
  *
  *  - `highWaterMark` = ListOffsets v1 at timestamp −1 (sarama's
  *    `GetOffset(..., OffsetNewest)`, kafka.go:166)
  *  - `produce` = Produce v2 with acks=−1 (WaitForAll, kafka.go:90) on a
  *    manual partition (kafka.go:92), returning base_offset + n — the
  *    per-message ack the reference checkpoints (kafka.go:421-488)
  *  - `fetchFrom` = Fetch v3 loop to the first response's high watermark
  *    (`ConsumePartition(topic, partition, ackedOffset+1)` …
  *    `HighWaterMarkOffset()-1`, kafka.go:213-227), CRC-verified per
  *    message by the decoder
  *
  * An ApiVersions v0 handshake on connect asserts the broker speaks the
  * dialect before any data flows. */
final class KafkaTopicClient(host: String, port: Int, topic: String,
    partition: Int = 0, clientId: String = "graft",
    fetchMaxBytes: Int = 1 << 20, messageFormat: Int = 1) extends TopicLike {
  require(messageFormat == 1 || messageFormat == 2,
    s"messageFormat must be 1 (0.10 MessageSet) or 2 (RecordBatch), got $messageFormat")
  // format 2 (magic-2 RecordBatch) rides Produce v3 / Fetch v4
  private val produceVersion = if (messageFormat == 2) 3 else 2
  private val fetchVersion = if (messageFormat == 2) 4 else 3

  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  // a dead/misbehaving broker must surface as a timeout, not an infinite
  // block inside readFully
  sock.setSoTimeout(30000)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)
  private var correlation = 0

  // handshake failures must not leak the connected socket: nobody holds a
  // reference to call close() on when the constructor throws
  try {
    val (err, apis) = decodeApiVersionsResponse(call(ApiApiVersions, 0, Array.emptyByteArray))
    require(err == ErrNone, s"ApiVersions error $err")
    def supports(key: Int, version: Int): Boolean =
      apis.exists(a => a.apiKey == key && a.minVersion <= version && version <= a.maxVersion)
    require(supports(ApiProduce, produceVersion) && supports(ApiFetch, fetchVersion) &&
      supports(ApiListOffsets, 1),
      s"broker does not speak the required dialect (format v$messageFormat): $apis")
    // discovery, like every real client: the broker must LEAD this
    // (topic, partition) before any data flows — producing to a partition
    // the node doesn't own would be silently wrong against a real cluster
    val meta = decodeMetadataResponse(call(ApiMetadata, 0,
      encodeMetadataRequest(Seq(topic))))
    val owned = meta.topics.find(_.name == topic).toSeq
      .flatMap(_.partitions).filter(p => p.errorCode == ErrNone)
    require(owned.exists(_.partition == partition),
      s"broker does not lead $topic/$partition (has ${owned.map(_.partition).mkString(",")})")
  } catch {
    case e: Throwable =>
      try sock.close() catch { case _: Exception => () }
      throw e
  }

  private def call(apiKey: Int, apiVersion: Int, body: Array[Byte]): Reader =
    synchronized {
      correlation += 1
      val w = new Writer()
      writeRequestHeader(w, RequestHeader(apiKey, apiVersion, correlation, clientId))
      w.raw(body)
      writeFrame(out, w.result)
      val r = new Reader(readFrame(in))
      val got = r.i32()
      require(got == correlation, s"correlation mismatch: sent $correlation, got $got")
      r
    }

  def highWaterMark(): Long = {
    val resp = decodeListOffsetsResponse(call(ApiListOffsets, 1,
      encodeListOffsetsRequest(ListOffsetsRequest(topic, partition, TimestampLatest))))
    require(resp.errorCode == ErrNone, s"ListOffsets error ${resp.errorCode}")
    // a regressed hwm means the topic was truncated/recreated since the
    // last Fetch round — the page-continuation buffer would otherwise keep
    // serving bytes from the DELETED log and mask the purge diagnosis
    // until the next fresh fetch. Compare against the buffer's END (last
    // buffered offset + 1), not its start: a truncation landing INSIDE the
    // buffered range also invalidates everything buffered at/past the new
    // hwm, and the retained prefix may differ after a recreate too.
    synchronized {
      val bufEnd = pageBuf.lastOption.map(_._1 + 1).getOrElse(pageBufNext)
      if (resp.offset < bufEnd) { pageBuf = Vector.empty; pageBufNext = -1L }
    }
    resp.offset
  }

  override def logStartOffset(): Long = {
    val resp = decodeListOffsetsResponse(call(ApiListOffsets, 1,
      encodeListOffsetsRequest(ListOffsetsRequest(topic, partition, TimestampEarliest))))
    require(resp.errorCode == ErrNone, s"ListOffsets error ${resp.errorCode}")
    resp.offset
  }

  def produce(msg: Array[Byte]): Long = {
    val m = Msg(0L, System.currentTimeMillis(), null, msg)
    val req = ProduceRequest(acks = -1, timeoutMs = 10000, topic, partition,
      if (messageFormat == 2) KafkaWireV2.encodeRecordBatch(Seq(m))
      else encodeMessageSet(Seq(m)))
    val resp = decodeProduceResponse(call(ApiProduce, produceVersion,
      if (messageFormat == 2) KafkaWireV2.encodeProduceRequestV3(req)
      else encodeProduceRequest(req)))
    require(resp.errorCode == ErrNone, s"Produce error ${resp.errorCode}")
    // this append's own ack: its offset + 1 (the TopicLike contract) —
    // never a topic-hwm re-query, which under a second writer would cover
    // messages this producer did not send
    resp.baseOffset + 1L
  }

  /** One Fetch round at the dialect's version, decoded with the matching
    * record-format codec. */
  private def fetchOnce(fromOffset: Long): (KafkaWire.FetchResponse, Vector[Msg]) = {
    val req = FetchRequest(maxWaitMs = 500, minBytes = 1,
      maxBytes = fetchMaxBytes, topic, partition, fromOffset,
      partitionMaxBytes = fetchMaxBytes)
    val raw = call(ApiFetch, fetchVersion,
      if (messageFormat == 2) KafkaWireV2.encodeFetchRequestV4(req)
      else encodeFetchRequest(req))
    val resp = if (messageFormat == 2) KafkaWireV2.decodeFetchResponseV4(raw)
      else decodeFetchResponse(raw)
    if (resp.errorCode == ErrOffsetOutOfRange)
      throw new IllegalStateException(
        s"fetch offset $fromOffset out of range for $topic/$partition " +
          s"(hwm ${resp.highWatermark}): topic truncated past the checkpointed offset")
    require(resp.errorCode == ErrNone, s"Fetch error ${resp.errorCode}")
    val msgs = if (messageFormat == 2) KafkaWireV2.decodeRecordBatches(resp.messageSet)
      else decodeMessageSet(resp.messageSet)
    (resp, msgs)
  }

  // Remainder of the last Fetch round not yet handed out by fetchPage:
  // a 1 MiB Fetch response can carry thousands of messages, and slicing
  // it to maxMessages then REFETCHING the rest next page would discard
  // ~90% of every response (measured: 218k -> 168k ops/s through the
  // consume source). Bounded by fetchMaxBytes, so holding it costs at
  // most one wire round of memory. The continuation state makes this
  // client STATEFUL across fetchPage calls: one client serves ONE
  // sequential consumer (the wire protocol is sequential on the single
  // socket anyway — `call` serializes); fetchPage synchronizes on the
  // same monitor so a misuse from two threads corrupts nothing, but
  // interleaved consumers would still thrash the continuation buffer —
  // give each consumer its own client.
  private var pageBuf: Vector[(Long, Array[Byte])] = Vector.empty
  private var pageBufNext = -1L // continuation offset of the last served page

  /** One bounded page — at most `maxMessages` messages, served from the
    * remainder of the previous Fetch round when the requested offset
    * continues it, else from one fresh Fetch round. "Continues" is EITHER
    * the buffered head's own offset OR the continuation offset of the last
    * served slice — the two differ on a compacted/transactional log, where
    * the next retained offset jumps a benign gap; matching only the head
    * would discard the remainder and refetch the same bytes at every gap
    * that straddles a page boundary. A high-water mark observed below the
    * continuation offset (topic truncated/recreated between pages)
    * invalidates the buffer — see [[highWaterMark]]. */
  override def fetchPage(fromOffset: Long, maxMessages: Int): Vector[(Long, Array[Byte])] =
    synchronized {
      val continues = pageBuf.nonEmpty &&
        (pageBuf.head._1 == fromOffset || fromOffset == pageBufNext)
      if (!continues) {
        val (resp, msgs) = fetchOnce(fromOffset)
        pageBuf = msgs.filter(m => m.offset >= fromOffset && m.offset < resp.highWatermark)
          .map(m => (m.offset, m.value))
      }
      val (page, rest) = pageBuf.splitAt(maxMessages)
      pageBuf = rest
      if (page.nonEmpty) pageBufNext = page.last._1 + 1
      page
    }

  def fetchFrom(fromOffset: Long): Vector[(Long, Array[Byte])] = {
    val res = Vector.newBuilder[(Long, Array[Byte])]
    var next = fromOffset
    var hwm = -1L // bound the scan at the FIRST response's high watermark
    var done = false
    while (!done) {
      // OffsetOutOfRange (thrown by fetchOnce) means retention deleted
      // messages past the resume offset (or the checkpoint is bogus) — the
      // recovery scan MUST fail loudly there; treating it as "nothing
      // newer" would silently skip un-acked messages and restart the
      // producer from a stale seq
      val (resp, decoded) = fetchOnce(next)
      if (hwm < 0) hwm = resp.highWatermark
      // bound every page (not just the loop condition) by the FIRST hwm:
      // a concurrent second writer can append past it mid-scan, and those
      // offsets must not leak into this bounded recovery read
      val msgs = decoded.filter(m => m.offset >= next && m.offset < hwm)
      msgs.foreach(m => res += ((m.offset, m.value)))
      next = if (msgs.nonEmpty) msgs.last.offset + 1 else next
      done = msgs.isEmpty || next >= hwm
    }
    res.result()
  }

  override def close(): Unit = sock.close()
}
