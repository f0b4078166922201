package graft.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

import KafkaWire._

/** A single-node in-memory broker speaking the REAL Kafka wire protocol
  * (the [[KafkaWire]] dialect: ApiVersions v0, ListOffsets v1, Produce v2,
  * Fetch v3, message format v1) — the upgrade of `cdc.TopicServer` from a
  * private length-prefixed wire to actual Kafka frames, so the K1 sink
  * lifecycle (produce acks, recovery scan, HA second-writer races) runs
  * against the same bytes a real 0.10.x broker would exchange
  * (/root/reference/sink/kafka/kafka.go:134-255 is the consumer of this
  * contract). Connections are persistent with pipelined request/response
  * pairs, like the real thing; one log per (topic, partition), offsets
  * assigned on append.
  */
final class KafkaBroker(seed: Map[(String, Int), Seq[Array[Byte]]] = Map.empty) {

  /** (timestamp, key, value) by (topic, partition), in offset order — the
    * key is stored and re-served, not discarded (keyed producers exist). */
  private val logs = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[(Long, Array[Byte], Array[Byte])]]
  seed.foreach { case (tp, msgs) =>
    logs(tp) = mutable.ArrayBuffer(msgs.map(m => (0L, null: Array[Byte], m)): _*)
  }

  private val server = new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1"))
  @volatile private var closed = false

  def port: Int = server.getLocalPort

  def highWaterMark(topic: String, partition: Int): Long =
    synchronized(logs.get((topic, partition)).map(_.size.toLong).getOrElse(0L))

  private def append(topic: String, partition: Int,
      values: Seq[(Long, Array[Byte], Array[Byte])]): Long =
    synchronized {
      val log = logs.getOrElseUpdate((topic, partition), mutable.ArrayBuffer.empty)
      val base = log.size.toLong
      log ++= values
      base
    }

  /** At most ~`maxBytes` worth of messages from `from` (always ≥ 1 when
    * any exist), copied under the lock via O(1) indexed access — never the
    * whole remaining log: a paging consumer would otherwise make each
    * fetch O(n) and a full consume O(n²), with produces stalled behind the
    * copy. */
  private def slice(topic: String, partition: Int, from: Long,
      maxBytes: Int): (Long, Vector[(Long, Long, Array[Byte], Array[Byte])]) =
    synchronized {
      val log = logs.getOrElse((topic, partition), mutable.ArrayBuffer.empty)
      val hwm = log.size.toLong
      val out = Vector.newBuilder[(Long, Long, Array[Byte], Array[Byte])]
      var bytes = 0L
      var i = math.max(from, 0L)
      while (i < hwm && (bytes == 0L || bytes < maxBytes)) {
        val (ts, k, v) = log(i.toInt)
        out += ((i, ts, k, v))
        bytes += v.length + (if (k == null) 0 else k.length) + 34L
        i += 1
      }
      (hwm, out.result())
    }

  def start(): KafkaBroker = {
    val t = new Thread(() => {
      while (!closed) {
        try {
          val sock = server.accept()
          val h = new Thread(() => handle(sock), "kafka-broker-conn")
          h.setDaemon(true)
          h.start()
        } catch { case _: Exception => () } // closed
      }
    }, "kafka-broker-accept")
    t.setDaemon(true)
    t.start()
    this
  }

  private def handle(sock: Socket): Unit =
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (!closed) {
        val frame = readFrame(in)
        val r = new Reader(frame)
        val h = readRequestHeader(r)
        // Each API is decoded only at the versions in the served ranges, so
        // advertise exactly those and refuse anything else up front —
        // silently decoding an unserved version at a pinned layout would
        // mis-parse it (e.g. Fetch v2 lacks v3's top-level max_bytes field).
        // ApiVersions is special-cased per the real broker's contract:
        // clients send it at their MAX version and downgrade on an
        // UNSUPPORTED_VERSION (35) response in a v0-shaped body — a
        // disconnect here would make the handshake impossible for any
        // client newer than v0.
        val versionOk = KafkaBroker.served.get(h.apiKey) match {
          case Some((lo, hi)) => h.apiVersion >= lo && h.apiVersion <= hi
          case None => true // unknown key: handled by the `case other` throw
        }
        if (!versionOk && h.apiKey != ApiApiVersions)
          throw new IllegalStateException(
            s"api key ${h.apiKey} served at versions " +
              s"${KafkaBroker.served(h.apiKey)}, got ${h.apiVersion}")
        val body: Array[Byte] = h.apiKey match {
          case ApiApiVersions if !versionOk =>
            encodeApiVersionsResponse(ErrUnsupportedVersion,
              KafkaBroker.served.toSeq.sortBy(_._1)
                .map { case (k, (lo, hi)) => ApiVersionRange(k, lo, hi) })

          case ApiApiVersions =>
            encodeApiVersionsResponse(ErrNone,
              KafkaBroker.served.toSeq.sortBy(_._1)
                .map { case (k, (lo, hi)) => ApiVersionRange(k, lo, hi) })

          case ApiMetadata =>
            // single node, sole leader; requested topics materialize with
            // one partition (auto-create semantics — produce to any topic
            // works, so metadata agrees); empty request = all known topics
            val asked = decodeMetadataRequest(r)
            val names =
              if (asked.nonEmpty) asked
              else synchronized(logs.keys.map(_._1).toVector.distinct.sorted)
            val self = BrokerMeta(0, "127.0.0.1", port)
            encodeMetadataResponse(MetadataResponse(Vector(self),
              names.map(n => TopicMeta(ErrNone, n, Vector(
                PartitionMeta(ErrNone, 0, leader = 0, Vector(0), Vector(0)))))
                .toVector))

          case ApiListOffsets =>
            val q = decodeListOffsetsRequest(r)
            val hwm = highWaterMark(q.topic, q.partition)
            val off = if (q.timestamp == TimestampEarliest) 0L else hwm
            encodeListOffsetsResponse(
              ListOffsetsResponse(q.topic, q.partition, ErrNone, q.timestamp, off))

          case ApiProduce =>
            // v2 carries a message-format-v1 set, v3 a magic-2 RecordBatch;
            // either way decode (and thereby CRC-verify), assign offsets,
            // stamp LogAppendTime — one log serves both dialects, like a
            // real broker's up/down-conversion
            val q = if (h.apiVersion >= 3) KafkaWireV2.decodeProduceRequestV3(r)
              else decodeProduceRequest(r)
            val now = System.currentTimeMillis()
            val resp =
              try {
                // STRICT decode on produce: a truncated set must answer
                // ErrCorruptMessage, never an ack for dropped records
                val msgs = if (h.apiVersion >= 3)
                  KafkaWireV2.decodeRecordBatches(q.messageSet, tolerateTruncation = false)
                else decodeMessageSet(q.messageSet, tolerateTruncation = false)
                val base = append(q.topic, q.partition, msgs.map(m => (now, m.key, m.value)))
                ProduceResponse(q.topic, q.partition, ErrNone, base, now, 0)
              } catch {
                // NonFatal, not just IllegalArgumentException: any decode
                // failure on a length-plausible but internally-truncated
                // batch must answer ErrCorruptMessage, never drop the
                // connection (Reader is bounds-checked, but the net stays
                // wide for defense in depth)
                case scala.util.control.NonFatal(_) =>
                  ProduceResponse(q.topic, q.partition, ErrCorruptMessage, -1L, -1L, 0)
              }
            encodeProduceResponse(resp) // response layout identical in v2/v3

          case ApiFetch =>
            val q = if (h.apiVersion >= 4) KafkaWireV2.decodeFetchRequestV4(r)
              else decodeFetchRequest(r)
            val (hwm, msgs) = slice(q.topic, q.partition, q.fetchOffset,
              math.max(1, q.partitionMaxBytes))
            def respond(set: Array[Byte], err: Int): Array[Byte] = {
              val p = FetchResponse(0, q.topic, q.partition, err, hwm, set)
              if (h.apiVersion >= 4) KafkaWireV2.encodeFetchResponseV4(p)
              else encodeFetchResponse(p)
            }
            if (q.fetchOffset > hwm)
              respond(Array.emptyByteArray, ErrOffsetOutOfRange)
            else if (h.apiVersion >= 4) {
              // v4: serve ONE RecordBatch based at the requested offset;
              // the slice is already byte-bounded (with ≥1-message progress)
              val set = if (msgs.isEmpty) Array.emptyByteArray
                else KafkaWireV2.encodeRecordBatch(msgs.map { case (off, ts, k, v) =>
                  Msg(off, ts, k, v) })
              respond(set, ErrNone)
            } else {
              // honor the byte limit but always make progress: at least one
              // message per non-empty fetch (the real broker's guarantee
              // for consumers with small max_bytes)
              val limit = math.max(1, q.partitionMaxBytes)
              val w = new Writer()
              var taken = 0
              var full = false
              msgs.foreach { case (off, ts, k, v) =>
                if (!full) {
                  val enc = encodeMessage(ts, k, v)
                  if (taken == 0 || w.size + 12 + enc.length <= limit) {
                    w.i64(off); w.i32(enc.length); w.raw(enc)
                    taken += 1
                  } else full = true // stop at first overflow: no offset gaps
                }
              }
              respond(w.result, ErrNone)
            }

          case other =>
            throw new IllegalStateException(s"unsupported api key $other")
        }
        writeFrame(out, new Writer().i32(h.correlationId).raw(body).result)
      }
    } catch {
      case _: EOFException | _: java.net.SocketException => () // peer closed
      case e: Exception =>
        // malformed frame / unsupported api: die like a real broker drops
        // the connection, but LOUDLY — a silent close is undiagnosable
        System.err.println(s"[kafka-broker] closing connection: ${e.getMessage}")
    }
    finally sock.close()

  def close(): Unit = { closed = true; server.close() }
}

object KafkaBroker {
  /** The (min, max) version range each API is decoded/encoded at: the
    * 0.10.x dialect the reference pins (Produce v2 / Fetch v3, message
    * format v1 — see [[KafkaWire]]) plus the modern RecordBatch dialect
    * (Produce v3 / Fetch v4, magic 2 — see [[KafkaWireV2]]). Every version
    * inside a range is actually served. */
  val served: Map[Int, (Int, Int)] = Map(
    ApiProduce -> (2, 3),
    ApiFetch -> (3, 4),
    ApiListOffsets -> (1, 1),
    ApiMetadata -> (0, 0),
    ApiApiVersions -> (0, 0))
}
