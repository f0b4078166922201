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
        // Each API is decoded at exactly ONE pinned version, so advertise
        // min == max and refuse anything else up front — silently decoding
        // a lower-version request at the pinned layout would mis-parse it
        // (e.g. Fetch v2 lacks v3's top-level max_bytes field).
        KafkaBroker.served.get(h.apiKey) match {
          case Some(v) if v != h.apiVersion =>
            throw new IllegalStateException(
              s"api key ${h.apiKey} served only at version $v, got ${h.apiVersion}")
          case _ => ()
        }
        val body: Array[Byte] = h.apiKey match {
          case ApiApiVersions =>
            encodeApiVersionsResponse(ErrNone,
              KafkaBroker.served.toSeq.sortBy(_._1)
                .map { case (k, v) => ApiVersionRange(k, v, v) })

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
            val q = decodeProduceRequest(r)
            // decode (and thereby CRC-verify) the producer's message set;
            // the broker assigns offsets and stamps LogAppendTime
            val now = System.currentTimeMillis()
            val resp =
              try {
                val msgs = decodeMessageSet(q.messageSet)
                val base = append(q.topic, q.partition, msgs.map(m => (now, m.key, m.value)))
                ProduceResponse(q.topic, q.partition, ErrNone, base, now, 0)
              } catch {
                case _: IllegalArgumentException =>
                  ProduceResponse(q.topic, q.partition, ErrCorruptMessage, -1L, -1L, 0)
              }
            encodeProduceResponse(resp)

          case ApiFetch =>
            val q = decodeFetchRequest(r)
            val (hwm, msgs) = slice(q.topic, q.partition, q.fetchOffset,
              math.max(1, q.partitionMaxBytes))
            if (q.fetchOffset > hwm)
              encodeFetchResponse(FetchResponse(0, q.topic, q.partition,
                ErrOffsetOutOfRange, hwm, Array.emptyByteArray))
            else {
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
              encodeFetchResponse(FetchResponse(0, q.topic, q.partition,
                ErrNone, hwm, w.result))
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
  /** The one version each API is decoded/encoded at (the 0.10.x dialect the
    * reference pins — see [[KafkaWire]]). */
  val served: Map[Int, Int] = Map(
    ApiProduce -> 2,
    ApiFetch -> 3,
    ApiListOffsets -> 1,
    ApiMetadata -> 0,
    ApiApiVersions -> 0)
}
