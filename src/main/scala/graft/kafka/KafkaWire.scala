package graft.kafka

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** The Kafka binary protocol, hand-rolled from the PUBLIC protocol guide
  * (kafka.apache.org/protocol) the same way `mysql/BinlogClient` was built
  * from the MySQL docs — closing the K1 seam the reference covers with
  * sarama pinned to 0.10.1.0 (/root/reference/sink/kafka/kafka.go:82-86).
  * That pin selects this exact dialect:
  *
  *  - framing: INT32 size ++ payload, big-endian throughout
  *  - request header: api_key INT16, api_version INT16, correlation INT32,
  *    client_id NULLABLE_STRING; response header: correlation INT32
  *  - message format v1 ("MessageSet", magic=1): per message
  *    `offset INT64, size INT32, crc INT32, magic INT8, attributes INT8,
  *    timestamp INT64, key BYTES, value BYTES`, crc = CRC-32 (IEEE) over
  *    magic..value — NOT the v2 RecordBatch (that is the 0.11+ format)
  *  - Produce v2 (acks/timeout + per-partition message set; response
  *    carries base_offset + log_append_time)
  *  - Fetch v3 (replica -1, max_wait/min_bytes/top-level max_bytes;
  *    response carries high_watermark + a message set)
  *  - ListOffsets v1 (timestamp −1 = latest; response offset = high water)
  *  - ApiVersions v0 (the capability handshake)
  *
  * Only the codec lives here; [[KafkaTopicClient]] drives it against a
  * socket and [[KafkaBroker]] serves it. Nothing below depends on any
  * Kafka library — the tests pin golden bytes against the published
  * layouts, so the codec is checked against the SPEC, not itself.
  */
object KafkaWire {

  val ApiProduce = 0
  val ApiFetch = 1
  val ApiListOffsets = 2
  val ApiMetadata = 3
  val ApiApiVersions = 18

  val ErrNone = 0
  val ErrOffsetOutOfRange = 1
  val ErrCorruptMessage = 2
  val ErrUnsupportedVersion = 35

  final class Writer {
    private val buf = new ByteArrayOutputStream()
    def i8(v: Int): Writer = { buf.write(v & 0xff); this }
    def i16(v: Int): Writer = { buf.write((v >> 8) & 0xff); buf.write(v & 0xff); this }
    def i32(v: Int): Writer = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Writer = { i32((v >> 32).toInt); i32(v.toInt); this }
    def raw(b: Array[Byte]): Writer = { buf.write(b, 0, b.length); this }
    /** STRING: INT16 length ++ UTF-8 bytes; null encodes as length −1. */
    def str(s: String): Writer =
      if (s == null) i16(-1)
      else { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    /** BYTES: INT32 length ++ bytes; null encodes as length −1. */
    def bytes(b: Array[Byte]): Writer =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    def result: Array[Byte] = buf.toByteArray
    def size: Int = buf.size
  }

  final class Reader(val buf: Array[Byte], var pos: Int = 0) {
    // bounds-checked like raw(): a truncated buffer must surface as
    // IllegalArgumentException (→ ErrCorruptMessage in the broker's strict
    // produce path), never ArrayIndexOutOfBoundsException, which would
    // escape the corrupt-message catch and drop the connection instead
    def i8(): Int = {
      require(pos < buf.length, s"truncated read of 1 at $pos/${buf.length}")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def i16(): Int = ((i8() << 8) | i8()).toShort.toInt
    def i32(): Int = (i16() << 16) | (i16() & 0xffff)
    def i64(): Long = ((i32().toLong & 0xffffffffL) << 32) | (i32().toLong & 0xffffffffL)
    def raw(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= buf.length, s"truncated read of $n at $pos/${buf.length}")
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
    def str(): String = {
      val n = i16()
      if (n < 0) null else new String(raw(n), UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else raw(n)
    }
    def remaining: Int = buf.length - pos
  }

  final case class RequestHeader(apiKey: Int, apiVersion: Int,
      correlationId: Int, clientId: String)

  def writeRequestHeader(w: Writer, h: RequestHeader): Unit = {
    w.i16(h.apiKey); w.i16(h.apiVersion); w.i32(h.correlationId); w.str(h.clientId)
  }

  def readRequestHeader(r: Reader): RequestHeader =
    RequestHeader(r.i16(), r.i16(), r.i32(), r.str())

  // ---- message format v1 (MessageSet) ----

  final case class Msg(offset: Long, timestamp: Long, key: Array[Byte], value: Array[Byte])

  /** crc INT32 ++ magic ++ attributes ++ timestamp ++ key ++ value, with
    * crc = CRC-32 over everything after the crc field. */
  def encodeMessage(timestamp: Long, key: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val body = new Writer()
    body.i8(1) // magic 1
    body.i8(0) // attributes: no compression
    body.i64(timestamp)
    body.bytes(key)
    body.bytes(value)
    val bodyBytes = body.result
    val crc = new java.util.zip.CRC32()
    crc.update(bodyBytes)
    new Writer().i32(crc.getValue.toInt).raw(bodyBytes).result
  }

  /** One message set: `offset INT64, message_size INT32, message`*. The
    * producer writes placeholder offsets (0..n−1); the broker rewrites
    * them with assigned log offsets on append and on fetch serves the
    * absolute ones. */
  def encodeMessageSet(msgs: Seq[Msg]): Array[Byte] = {
    val w = new Writer()
    msgs.foreach { m =>
      val enc = encodeMessage(m.timestamp, m.key, m.value)
      w.i64(m.offset); w.i32(enc.length); w.raw(enc)
    }
    w.result
  }

  /** Decodes a message set, VERIFYING each crc. `tolerateTruncation`
    * (the default) drops a partial trailing message like consumers must —
    * brokers legitimately truncate FETCH responses at byte limits. The
    * broker's PRODUCE path decodes strictly instead: a producer's set
    * claiming more bytes than it carries is corruption, and tolerantly
    * dropping its tail would ack messages that were never stored. */
  def decodeMessageSet(bytes: Array[Byte],
      tolerateTruncation: Boolean = true): Vector[Msg] = {
    val r = new Reader(bytes)
    val out = Vector.newBuilder[Msg]
    def truncated(what: String): Unit =
      if (tolerateTruncation) r.pos = bytes.length // partial tail: stop
      else throw new IllegalArgumentException(s"truncated message set: $what")
    while (r.remaining > 0) {
      if (r.remaining < 12) truncated(s"${r.remaining} trailing bytes")
      else {
        val offset = r.i64()
        val size = r.i32()
        if (r.remaining < size)
          truncated(s"message at offset $offset claims $size bytes, ${r.remaining} left")
        else {
          val msg = new Reader(r.raw(size))
          val crc = msg.i32()
          val check = new java.util.zip.CRC32()
          check.update(msg.buf, 4, msg.buf.length - 4)
          require(check.getValue.toInt == crc,
            s"message crc mismatch at offset $offset")
          val magic = msg.i8()
          require(magic == 1, s"unsupported message magic $magic")
          msg.i8() // attributes (no compression support needed)
          val ts = msg.i64()
          val key = msg.bytes()
          val value = msg.bytes()
          out += Msg(offset, ts, key, value)
        }
      }
    }
    out.result()
  }

  // ---- Produce v2 ----

  final case class ProduceRequest(acks: Int, timeoutMs: Int, topic: String,
      partition: Int, messageSet: Array[Byte])
  final case class ProduceResponse(topic: String, partition: Int, errorCode: Int,
      baseOffset: Long, logAppendTime: Long, throttleMs: Int)

  def encodeProduceRequest(q: ProduceRequest): Array[Byte] = {
    val w = new Writer()
    w.i16(q.acks); w.i32(q.timeoutMs)
    w.i32(1); w.str(q.topic)
    w.i32(1); w.i32(q.partition)
    w.i32(q.messageSet.length); w.raw(q.messageSet)
    w.result
  }

  def decodeProduceRequest(r: Reader): ProduceRequest = {
    val acks = r.i16(); val timeout = r.i32()
    val nTopics = r.i32(); require(nTopics == 1, s"one topic per produce, got $nTopics")
    val topic = r.str()
    val nParts = r.i32(); require(nParts == 1, s"one partition per produce, got $nParts")
    val partition = r.i32()
    val setSize = r.i32()
    ProduceRequest(acks, timeout, topic, partition, r.raw(setSize))
  }

  def encodeProduceResponse(p: ProduceResponse): Array[Byte] = {
    val w = new Writer()
    w.i32(1); w.str(p.topic)
    w.i32(1); w.i32(p.partition); w.i16(p.errorCode)
    w.i64(p.baseOffset); w.i64(p.logAppendTime)
    w.i32(p.throttleMs)
    w.result
  }

  def decodeProduceResponse(r: Reader): ProduceResponse = {
    require(r.i32() == 1, "one topic expected")
    val topic = r.str()
    require(r.i32() == 1, "one partition expected")
    val partition = r.i32(); val err = r.i16()
    val base = r.i64(); val lat = r.i64()
    val throttle = r.i32()
    ProduceResponse(topic, partition, err, base, lat, throttle)
  }

  // ---- Fetch v3 ----

  final case class FetchRequest(maxWaitMs: Int, minBytes: Int, maxBytes: Int,
      topic: String, partition: Int, fetchOffset: Long, partitionMaxBytes: Int)
  final case class FetchResponse(throttleMs: Int, topic: String, partition: Int,
      errorCode: Int, highWatermark: Long, messageSet: Array[Byte])

  def encodeFetchRequest(q: FetchRequest): Array[Byte] = {
    val w = new Writer()
    w.i32(-1) // replica_id: a normal consumer
    w.i32(q.maxWaitMs); w.i32(q.minBytes); w.i32(q.maxBytes)
    w.i32(1); w.str(q.topic)
    w.i32(1); w.i32(q.partition); w.i64(q.fetchOffset); w.i32(q.partitionMaxBytes)
    w.result
  }

  def decodeFetchRequest(r: Reader): FetchRequest = {
    val replica = r.i32(); require(replica == -1, s"only consumer fetches, got replica $replica")
    val maxWait = r.i32(); val minBytes = r.i32(); val maxBytes = r.i32()
    require(r.i32() == 1, "one topic per fetch")
    val topic = r.str()
    require(r.i32() == 1, "one partition per fetch")
    val partition = r.i32(); val off = r.i64(); val pmax = r.i32()
    FetchRequest(maxWait, minBytes, maxBytes, topic, partition, off, pmax)
  }

  def encodeFetchResponse(p: FetchResponse): Array[Byte] = {
    val w = new Writer()
    w.i32(p.throttleMs)
    w.i32(1); w.str(p.topic)
    w.i32(1); w.i32(p.partition); w.i16(p.errorCode); w.i64(p.highWatermark)
    w.i32(p.messageSet.length); w.raw(p.messageSet)
    w.result
  }

  def decodeFetchResponse(r: Reader): FetchResponse = {
    val throttle = r.i32()
    require(r.i32() == 1, "one topic expected")
    val topic = r.str()
    require(r.i32() == 1, "one partition expected")
    val partition = r.i32(); val err = r.i16(); val hwm = r.i64()
    val setSize = r.i32()
    FetchResponse(throttle, topic, partition, err, hwm, r.raw(setSize))
  }

  // ---- ListOffsets v1 ----

  final case class ListOffsetsRequest(topic: String, partition: Int, timestamp: Long)
  final case class ListOffsetsResponse(topic: String, partition: Int, errorCode: Int,
      timestamp: Long, offset: Long)

  val TimestampLatest: Long = -1L
  val TimestampEarliest: Long = -2L

  def encodeListOffsetsRequest(q: ListOffsetsRequest): Array[Byte] = {
    val w = new Writer()
    w.i32(-1) // replica_id
    w.i32(1); w.str(q.topic)
    w.i32(1); w.i32(q.partition); w.i64(q.timestamp)
    w.result
  }

  def decodeListOffsetsRequest(r: Reader): ListOffsetsRequest = {
    r.i32() // replica_id
    require(r.i32() == 1, "one topic per list-offsets")
    val topic = r.str()
    require(r.i32() == 1, "one partition per list-offsets")
    ListOffsetsRequest(topic, r.i32(), r.i64())
  }

  def encodeListOffsetsResponse(p: ListOffsetsResponse): Array[Byte] = {
    val w = new Writer()
    w.i32(1); w.str(p.topic)
    w.i32(1); w.i32(p.partition); w.i16(p.errorCode); w.i64(p.timestamp); w.i64(p.offset)
    w.result
  }

  def decodeListOffsetsResponse(r: Reader): ListOffsetsResponse = {
    require(r.i32() == 1, "one topic expected")
    val topic = r.str()
    require(r.i32() == 1, "one partition expected")
    ListOffsetsResponse(topic, r.i32(), r.i16(), r.i64(), r.i64())
  }

  // ---- Metadata v0 ----

  final case class PartitionMeta(errorCode: Int, partition: Int, leader: Int,
      replicas: Vector[Int], isr: Vector[Int])
  final case class TopicMeta(errorCode: Int, name: String, partitions: Vector[PartitionMeta])
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class MetadataResponse(brokers: Vector[BrokerMeta], topics: Vector[TopicMeta])

  /** v0 request: just the topic-name array (empty = all known topics). */
  def encodeMetadataRequest(topics: Seq[String]): Array[Byte] = {
    val w = new Writer()
    w.i32(topics.size)
    topics.foreach(w.str)
    w.result
  }

  def decodeMetadataRequest(r: Reader): Vector[String] =
    Vector.fill(r.i32())(r.str())

  def encodeMetadataResponse(m: MetadataResponse): Array[Byte] = {
    val w = new Writer()
    w.i32(m.brokers.size)
    m.brokers.foreach { b => w.i32(b.nodeId); w.str(b.host); w.i32(b.port) }
    w.i32(m.topics.size)
    m.topics.foreach { t =>
      w.i16(t.errorCode); w.str(t.name)
      w.i32(t.partitions.size)
      t.partitions.foreach { p =>
        w.i16(p.errorCode); w.i32(p.partition); w.i32(p.leader)
        w.i32(p.replicas.size); p.replicas.foreach(w.i32)
        w.i32(p.isr.size); p.isr.foreach(w.i32)
      }
    }
    w.result
  }

  def decodeMetadataResponse(r: Reader): MetadataResponse = {
    val brokers = Vector.fill(r.i32())(BrokerMeta(r.i32(), r.str(), r.i32()))
    val topics = Vector.fill(r.i32()) {
      val err = r.i16(); val name = r.str()
      val parts = Vector.fill(r.i32()) {
        val pe = r.i16(); val p = r.i32(); val l = r.i32()
        val reps = Vector.fill(r.i32())(r.i32())
        val isr = Vector.fill(r.i32())(r.i32())
        PartitionMeta(pe, p, l, reps, isr)
      }
      TopicMeta(err, name, parts)
    }
    MetadataResponse(brokers, topics)
  }

  // ---- ApiVersions v0 ----

  final case class ApiVersionRange(apiKey: Int, minVersion: Int, maxVersion: Int)

  def encodeApiVersionsResponse(errorCode: Int, apis: Seq[ApiVersionRange]): Array[Byte] = {
    val w = new Writer()
    w.i16(errorCode)
    w.i32(apis.size)
    apis.foreach { a => w.i16(a.apiKey); w.i16(a.minVersion); w.i16(a.maxVersion) }
    w.result
  }

  def decodeApiVersionsResponse(r: Reader): (Int, Vector[ApiVersionRange]) = {
    val err = r.i16()
    val n = r.i32()
    (err, Vector.fill(n)(ApiVersionRange(r.i16(), r.i16(), r.i16())))
  }

  // ---- framing ----

  def writeFrame(out: java.io.DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  /** Bounded read (64 MiB): a garbage size prefix fails fast instead of
    * allocating wild. */
  def readFrame(in: java.io.DataInputStream): Array[Byte] = {
    val size = in.readInt()
    require(size >= 0 && size <= (64 << 20), s"unreasonable kafka frame size $size")
    val b = new Array[Byte](size)
    in.readFully(b)
    b
  }
}
