package graft.kafka

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled Kafka wire layer. Three layers of proof:
  *
  *  1. GOLDEN BYTES — request/message encodings pinned byte-for-byte
  *     against the published protocol layouts (hand-assembled hex, not
  *     round-tripped through the codec), so the codec is checked against
  *     the spec rather than itself.
  *  2. Broker round-trip — ApiVersions handshake, produce acks, CRC
  *     verification, fetch paging under a byte limit.
  *  3. The K1 lifecycle over REAL frames — the TopicSimSpec restart
  *     scenarios (lost ack → recovery scan → seq resume, duplicate-free)
  *     re-run against the Kafka protocol, and the ProtoWire golden corpus
  *     produced/fetched intact (what an external sarama consumer of the
  *     reference's topic would need).
  */
class KafkaSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- 1. golden bytes ----

  test("message v1 layout and CRC match the published format (golden bytes)") {
    // value "hi", no key, timestamp 0x0102030405060708, magic 1, attrs 0:
    //   crc INT32 | 01 | 00 | ts INT64 | key -1 | value len 2 "hi"
    val body = "01" + "00" + "0102030405060708" + "ffffffff" + "00000002" + "6869"
    val crc = new java.util.zip.CRC32()
    crc.update(unhex(body))
    val expected = f"${crc.getValue.toInt}%08x" + body
    assert(hex(KafkaWire.encodeMessage(0x0102030405060708L, null,
      "hi".getBytes("UTF-8"))) == expected)
  }

  test("Produce v2 request matches the published layout (golden bytes)") {
    val set = KafkaWire.encodeMessageSet(Seq(
      KafkaWire.Msg(0L, 1546300800000L, null, Array[Byte](0x42))))
    val req = KafkaWire.encodeProduceRequest(
      KafkaWire.ProduceRequest(acks = -1, timeoutMs = 1500, "t", 0, set))
    // acks=-1 INT16 | timeout INT32 | 1 topic | "t" | 1 partition | p=0
    // | set size INT32 | set
    val expected = "ffff" + "000005dc" +
      "00000001" + "0001" + "74" +
      "00000001" + "00000000" +
      f"${set.length}%08x" + hex(set)
    assert(hex(req) == expected)
  }

  test("Fetch v3 and ListOffsets v1 requests match the published layouts") {
    val f = KafkaWire.encodeFetchRequest(KafkaWire.FetchRequest(
      maxWaitMs = 500, minBytes = 1, maxBytes = 1048576, "t", 0,
      fetchOffset = 7, partitionMaxBytes = 1048576))
    // replica -1 | max_wait | min_bytes | max_bytes | 1 topic "t"
    // | 1 partition | p=0 | offset 7 | partition max
    assert(hex(f) == "ffffffff" + "000001f4" + "00000001" + "00100000" +
      "00000001" + "0001" + "74" +
      "00000001" + "00000000" + "0000000000000007" + "00100000")
    val lo = KafkaWire.encodeListOffsetsRequest(
      KafkaWire.ListOffsetsRequest("t", 0, KafkaWire.TimestampLatest))
    assert(hex(lo) == "ffffffff" + "00000001" + "0001" + "74" +
      "00000001" + "00000000" + "ffffffffffffffff")
  }

  test("request header layout: api_key, version, correlation, client_id") {
    val w = new KafkaWire.Writer()
    KafkaWire.writeRequestHeader(w,
      KafkaWire.RequestHeader(KafkaWire.ApiProduce, 2, 0x0a0b0c0d, "cid"))
    assert(hex(w.result) == "0000" + "0002" + "0a0b0c0d" + "0003" + "636964")
  }

  test("decodeMessageSet verifies CRC and rejects corruption") {
    val good = KafkaWire.encodeMessageSet(Seq(
      KafkaWire.Msg(5L, 1L, null, Array[Byte](1, 2, 3))))
    val decoded = KafkaWire.decodeMessageSet(good)
    assert(decoded.map(m => (m.offset, m.value.toSeq)) == Vector((5L, Seq[Byte](1, 2, 3))))
    val corrupt = good.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException] { KafkaWire.decodeMessageSet(corrupt) }
  }

  // ---- 2. broker round-trip ----

  test("handshake + produce + hwm + fetch against the broker") {
    val broker = new KafkaBroker().start()
    try {
      val c = new KafkaTopicClient("127.0.0.1", broker.port, "ops")
      try {
        assert(c.highWaterMark() == 0L)
        assert(c.produce("a".getBytes) == 1L) // ack = own offset + 1
        assert(c.produce("b".getBytes) == 2L)
        assert(c.highWaterMark() == 2L)
        val got = c.fetchFrom(0L).map { case (off, v) => (off, new String(v)) }
        assert(got == Vector((0L, "a"), (1L, "b")))
        assert(c.fetchFrom(2L).isEmpty)
      } finally c.close()
    } finally broker.close()
  }

  test("fetch pages under a byte limit without gaps or duplicates") {
    val broker = new KafkaBroker().start()
    try {
      val writer = new KafkaTopicClient("127.0.0.1", broker.port, "ops")
      val payloads = (0 until 50).map(i => s"payload-$i-${"x" * 100}")
      try payloads.foreach(p => writer.produce(p.getBytes))
      finally writer.close()
      // a limit far below the total forces many fetch round-trips
      val reader = new KafkaTopicClient("127.0.0.1", broker.port, "ops",
        fetchMaxBytes = 256)
      try {
        val got = reader.fetchFrom(0L)
        assert(got.map(_._1) == (0L until 50L).toVector) // no gaps, no dups
        assert(got.map(p => new String(p._2)) == payloads.toVector)
      } finally reader.close()
    } finally broker.close()
  }

  test("message keys survive the broker round-trip") {
    val broker = new KafkaBroker().start()
    try {
      val set = KafkaWire.encodeMessageSet(Seq(
        KafkaWire.Msg(0L, 1L, "k1".getBytes, "v1".getBytes),
        KafkaWire.Msg(0L, 2L, null, "v2".getBytes)))
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        def call(api: Int, ver: Int, body: Array[Byte]): KafkaWire.Reader = {
          val w = new KafkaWire.Writer()
          KafkaWire.writeRequestHeader(w, KafkaWire.RequestHeader(api, ver, 1, "t"))
          w.raw(body)
          KafkaWire.writeFrame(out, w.result)
          val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
          r.i32(); r
        }
        val pr = KafkaWire.decodeProduceResponse(call(KafkaWire.ApiProduce, 2,
          KafkaWire.encodeProduceRequest(KafkaWire.ProduceRequest(-1, 1000, "ops", 0, set))))
        assert(pr.errorCode == KafkaWire.ErrNone)
        val fr = KafkaWire.decodeFetchResponse(call(KafkaWire.ApiFetch, 3,
          KafkaWire.encodeFetchRequest(KafkaWire.FetchRequest(500, 1, 1 << 20, "ops", 0, 0L, 1 << 20))))
        val msgs = KafkaWire.decodeMessageSet(fr.messageSet)
        assert(msgs.map(m => Option(m.key).map(new String(_))) == Vector(Some("k1"), None))
        assert(msgs.map(m => new String(m.value)) == Vector("v1", "v2"))
      } finally sock.close()
    } finally broker.close()
  }

  test("broker rejects a CRC-corrupted produce with ErrCorruptMessage") {
    val broker = new KafkaBroker().start()
    try {
      val set = KafkaWire.encodeMessageSet(Seq(
        KafkaWire.Msg(0L, 1L, null, "payload".getBytes)))
      set(set.length - 1) = (set(set.length - 1) ^ 0x01).toByte
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiProduce, 2, 1, "t"))
        w.raw(KafkaWire.encodeProduceRequest(
          KafkaWire.ProduceRequest(-1, 1000, "ops", 0, set)))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r.i32() == 1) // correlation
        val resp = KafkaWire.decodeProduceResponse(r)
        assert(resp.errorCode == KafkaWire.ErrCorruptMessage)
        assert(broker.highWaterMark("ops", 0) == 0L) // nothing appended
      } finally sock.close()
    } finally broker.close()
  }

  test("broker rejects a TRUNCATED produce set instead of acking dropped messages") {
    val broker = new KafkaBroker().start()
    try {
      val set = KafkaWire.encodeMessageSet(Seq(
        KafkaWire.Msg(0L, 1L, null, "payload".getBytes))).dropRight(3)
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiProduce, 2, 1, "t"))
        w.raw(KafkaWire.encodeProduceRequest(
          KafkaWire.ProduceRequest(-1, 1000, "ops", 0, set)))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        r.i32()
        // a consumer-style tolerant decode would drop the partial message
        // and ack ErrNone for data that was never stored — the produce
        // path must answer ErrCorruptMessage instead
        val resp = KafkaWire.decodeProduceResponse(r)
        assert(resp.errorCode == KafkaWire.ErrCorruptMessage)
        assert(broker.highWaterMark("ops", 0) == 0L)
      } finally sock.close()
    } finally broker.close()
  }

  test("metadata discovery: sole broker leads partition 0; others refuse") {
    val broker = new KafkaBroker().start()
    try {
      // partition 0: connect succeeds and metadata round-trips
      val c = new KafkaTopicClient("127.0.0.1", broker.port, "ops")
      try c.produce("x".getBytes) finally c.close()
      // a partition this node does not lead fails fast at connect
      val e = intercept[IllegalArgumentException] {
        new KafkaTopicClient("127.0.0.1", broker.port, "ops", partition = 3)
      }
      assert(e.getMessage.contains("does not lead"))
    } finally broker.close()
  }

  test("metadata response layout round-trips (v0)") {
    val m = KafkaWire.MetadataResponse(
      Vector(KafkaWire.BrokerMeta(0, "127.0.0.1", 9092)),
      Vector(KafkaWire.TopicMeta(0, "ops", Vector(
        KafkaWire.PartitionMeta(0, 0, 0, Vector(0), Vector(0))))))
    val d = KafkaWire.decodeMetadataResponse(
      new KafkaWire.Reader(KafkaWire.encodeMetadataResponse(m)))
    assert(d == m)
    assert(KafkaWire.decodeMetadataRequest(new KafkaWire.Reader(
      KafkaWire.encodeMetadataRequest(Seq("a", "b")))) == Vector("a", "b"))
  }

  test("broker advertises exactly the version ranges it serves") {
    val broker = new KafkaBroker().start()
    try {
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiApiVersions, 0, 1, "t"))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r.i32() == 1)
        val (err, apis) = KafkaWire.decodeApiVersionsResponse(r)
        assert(err == KafkaWire.ErrNone)
        assert(apis.map(a => a.apiKey -> (a.minVersion, a.maxVersion)).toMap ==
          KafkaBroker.served)
      } finally sock.close()
    } finally broker.close()
  }

  test("ApiVersions at an unserved version answers UNSUPPORTED_VERSION, not a disconnect") {
    val broker = new KafkaBroker().start()
    try {
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        // real clients open with ApiVersions at their MAX version and
        // downgrade on an error-35 v0-shaped response — a disconnect here
        // would make the handshake impossible for any client newer than v0
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiApiVersions, 3, 7, "t"))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r.i32() == 7)
        val (err, apis) = KafkaWire.decodeApiVersionsResponse(r)
        assert(err == KafkaWire.ErrUnsupportedVersion)
        assert(apis.map(a => a.apiKey -> (a.minVersion, a.maxVersion)).toMap ==
          KafkaBroker.served) // ranges still advertised for the downgrade
        // the connection survives: the v0 retry completes the handshake
        val w2 = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w2,
          KafkaWire.RequestHeader(KafkaWire.ApiApiVersions, 0, 8, "t"))
        KafkaWire.writeFrame(out, w2.result)
        val r2 = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r2.i32() == 8)
        assert(KafkaWire.decodeApiVersionsResponse(r2)._1 == KafkaWire.ErrNone)
      } finally sock.close()
    } finally broker.close()
  }

  test("internally-truncated v2 batch (valid CRC, short records) answers ErrCorruptMessage") {
    val broker = new KafkaBroker().start()
    try {
      // a batch whose length and CRC are self-consistent but whose record
      // COUNT claims more records than the body carries: decode sails past
      // the CRC check and runs off the end inside record parsing — that
      // must surface as ErrCorruptMessage, never an escaped
      // ArrayIndexOutOfBounds that drops the connection
      val one = KafkaWire.Msg(0L, 5L, null, "payload".getBytes)
      val tail = new KafkaWire.Writer()
      tail.i16(0); tail.i32(1); tail.i64(5L); tail.i64(5L)
      tail.i64(-1L); tail.i16(-1); tail.i32(-1)
      tail.i32(2) // claims TWO records...
      val rec = new KafkaWire.Writer()
      rec.i8(0)
      KafkaWireV2.writeVarLong(rec, 0L); KafkaWireV2.writeVarLong(rec, 0L)
      KafkaWireV2.writeVarInt(rec, -1)
      KafkaWireV2.writeVarInt(rec, one.value.length); rec.raw(one.value)
      KafkaWireV2.writeVarInt(rec, 0)
      val recBytes = rec.result
      KafkaWireV2.writeVarInt(tail, recBytes.length); tail.raw(recBytes) // ...carries one
      val tailBytes = tail.result
      val crc = { val c = new java.util.zip.CRC32C(); c.update(tailBytes); c.getValue.toInt }
      val batch = new KafkaWire.Writer()
      batch.i64(0L); batch.i32(4 + 1 + 4 + tailBytes.length)
      batch.i32(-1); batch.i8(2); batch.i32(crc); batch.raw(tailBytes)
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiProduce, 3, 1, "t"))
        w.raw(KafkaWireV2.encodeProduceRequestV3(
          KafkaWire.ProduceRequest(-1, 1000, "ops", 0, batch.result)))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r.i32() == 1)
        val resp = KafkaWire.decodeProduceResponse(r)
        assert(resp.errorCode == KafkaWire.ErrCorruptMessage)
        assert(broker.highWaterMark("ops", 0) == 0L) // nothing appended
      } finally sock.close()
    } finally broker.close()
  }

  test("broker refuses a request at an unserved api version (drops the connection)") {
    val broker = new KafkaBroker().start()
    try {
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        // Fetch v2 (advertised-min-zero used to imply this works; v2 lacks
        // v3's top-level max_bytes, so decoding it at the pinned v3 layout
        // would mis-parse) — the broker must close rather than guess
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiFetch, 2, 1, "t"))
        w.raw(KafkaWire.encodeFetchRequest(KafkaWire.FetchRequest(
          500, 1, 1 << 20, "ops", 0, 0L, 1 << 20)))
        KafkaWire.writeFrame(out, w.result)
        intercept[java.io.IOException] { KafkaWire.readFrame(in) }
      } finally sock.close()
    } finally broker.close()
  }

  test("fetchFrom bounds every page at the FIRST response's high watermark") {
    // scripted broker: the first Fetch says hwm=2 and serves offset 0; the
    // second says hwm=4 (a concurrent second writer appended mid-scan) and
    // serves offsets 1..3. The bounded recovery read must return [0, 1] —
    // offsets past the first hwm belong to the next scan, not this one.
    val pages = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]]()
    pages.put(KafkaWire.encodeFetchResponse(KafkaWire.FetchResponse(0, "ops", 0,
      KafkaWire.ErrNone, 2L,
      KafkaWire.encodeMessageSet(Seq(KafkaWire.Msg(0L, 1L, null, "m0".getBytes))))))
    pages.put(KafkaWire.encodeFetchResponse(KafkaWire.FetchResponse(0, "ops", 0,
      KafkaWire.ErrNone, 4L,
      KafkaWire.encodeMessageSet(Seq(
        KafkaWire.Msg(1L, 1L, null, "m1".getBytes),
        KafkaWire.Msg(2L, 1L, null, "m2".getBytes),
        KafkaWire.Msg(3L, 1L, null, "m3".getBytes))))))
    val server = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new java.io.DataInputStream(sock.getInputStream)
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        while (true) {
          val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
          val h = KafkaWire.readRequestHeader(r)
          val body: Array[Byte] = h.apiKey match {
            case KafkaWire.ApiApiVersions =>
              KafkaWire.encodeApiVersionsResponse(KafkaWire.ErrNone,
                KafkaBroker.served.toSeq.map { case (k, (lo, hi)) =>
                  KafkaWire.ApiVersionRange(k, lo, hi) })
            case KafkaWire.ApiMetadata =>
              KafkaWire.encodeMetadataResponse(KafkaWire.MetadataResponse(
                Vector(KafkaWire.BrokerMeta(0, "127.0.0.1", server.getLocalPort)),
                Vector(KafkaWire.TopicMeta(KafkaWire.ErrNone, "ops", Vector(
                  KafkaWire.PartitionMeta(KafkaWire.ErrNone, 0, 0, Vector(0), Vector(0)))))))
            case KafkaWire.ApiFetch => pages.take()
            case other => throw new IllegalStateException(s"unexpected api $other")
          }
          KafkaWire.writeFrame(out,
            new KafkaWire.Writer().i32(h.correlationId).raw(body).result)
        }
      } catch { case _: Exception => () }
    }, "scripted-broker")
    t.setDaemon(true)
    t.start()
    try {
      val c = new KafkaTopicClient("127.0.0.1", server.getLocalPort, "ops")
      try {
        val got = c.fetchFrom(0L).map { case (off, v) => (off, new String(v)) }
        assert(got == Vector((0L, "m0"), (1L, "m1")))
      } finally c.close()
    } finally server.close()
  }

  // ---- 3. the K1 lifecycle over real frames ----

  private def insert(logPos: Long, id: Long): Operation = {
    val table = TableDef("test", "t", Vector(
      ColumnDef("id", "int(11)", InnerType.LONG, key = "PRI", nullable = false)))
    Operation(
      OperationHeader(66693, OpType.Insert, 1546300800L, logPos),
      table = Some(table),
      rows = Vector(OpRow(None, Some(Vector(Some(id.toString))))))
  }

  private def begin(logPos: Long): Operation =
    Operation(OperationHeader(66693, OpType.Begin, 1546300800L, logPos))

  private def commit(logPos: Long): Operation =
    Operation(OperationHeader(66693, OpType.Commit, 1546300800L, logPos),
      progress = Some(Progress(Position("mysql-bin.000008", logPos, 66693), None)))

  private def trx(basePos: Long, id: Long): Seq[Operation] =
    Seq(begin(basePos), insert(basePos + 50, id), commit(basePos + 100))

  test("lost ack → recovery scan over Kafka frames → seq resume, no duplicates") {
    val broker = new KafkaBroker().start()
    try {
      val client = new KafkaTopicClient("127.0.0.1", broker.port, "dolphin")
      try {
        val producer = new FragmentingProducer(producerId = 1L)
        // trx1 produced AND acked; trx2 produced but the ack was lost
        val msgs1 = producer.produce(trx(200, 1))
        msgs1.foreach(m => client.produce(Wire.encodeMessage(m)))
        val ackedAfter1 = Checkpoint(Progress(Position("mysql-bin.000008", 300, 66693), None))
          .withIntCtx("acked_seq", msgs1.last.seq)
          .withIntCtx("acked_offset", client.highWaterMark() - 1)
        val msgs2 = producer.produce(trx(400, 2))
        msgs2.foreach(m => client.produce(Wire.encodeMessage(m)))

        // restart: KafkaRecovery drives ListOffsets + Fetch over the wire
        val rec = KafkaRecovery.recover(client, ackedAfter1)
        assert(rec.scanned == msgs2.size)
        assert(rec.ackedSeq == msgs2.last.seq)
        assert(rec.ackedOffset == client.highWaterMark() - 1)
        assert(rec.ckp.progress.pos == Position("mysql-bin.000008", 500, 66693))

        // resume from the recovered seq; a new trx continues with no gap
        val resumed = new FragmentingProducer(producerId = 1L, startSeq = rec.ackedSeq)
        val msgs3 = resumed.produce(trx(600, 3))
        msgs3.foreach(m => client.produce(Wire.encodeMessage(m)))
        assert(msgs3.head.seq == rec.ackedSeq + 1)

        // consumer proof: the whole topic decodes each insert exactly once
        val dec = new OperationDecoder
        val ops = client.fetchFrom(0L).flatMap { case (off, data) =>
          dec.feed(data, off).toSeq.flatMap(_.ops)
        }
        val ids = ops.filter(_.opType == OpType.Insert)
          .flatMap(_.rows).flatMap(_.after.toSeq).flatMap(_.headOption.flatten)
        assert(ids == Vector("1", "2", "3"))
      } finally client.close()
    } finally broker.close()
  }

  test("first run over Kafka: nothing acked, ackedOffset snaps to hwm-1") {
    val broker = new KafkaBroker().start()
    try {
      val client = new KafkaTopicClient("127.0.0.1", broker.port, "dolphin")
      try {
        client.produce("preexisting".getBytes)
        val rec = KafkaRecovery.recover(client, Checkpoint(Progress.zero))
        assert(rec.scanned == 0)
        assert(rec.ackedOffset == client.highWaterMark() - 1)
      } finally client.close()
    } finally broker.close()
  }

  test("ProtoWire golden corpus survives the broker byte-for-byte") {
    // the reference's protobuf envelope (the ProtoWireSpec golden message)
    // produced as a Kafka value and fetched back — an external consumer
    // of the reference's topic would decode exactly these bytes
    val goldenPayload =
      "0a380a0d0801100118d2edf3f50520ec0e422733653131666134372d373163612d313165312d39" +
      "6533332d6338306161393432393536323a32330a560a0d0801100418d2edf3f50520d00f6a3a0a" +
      "0264621201741a140a0269641207696e742831312918032a035052491a1b0a0176120b76617263" +
      "68617228313029180f3207757466386d623472091203120137120208010a5a0a0d0801100318d2" +
      "edf3f50520b4107a490a056d7973716c10011a106d7973716c2d62696e2e30303030303320b410" +
      "2a2933653131666134372d373163612d313165312d396533332d6338306161393432393536323a" +
      "312d3233"
    val golden = unhex("08011007280338037aee01" + goldenPayload)
    val broker = new KafkaBroker().start()
    try {
      val c = new KafkaTopicClient("127.0.0.1", broker.port, "dolphin")
      try {
        c.produce(golden)
        val got = c.fetchFrom(0L)
        assert(got.size == 1 && got.head._2.sameElements(golden))
        val m = ProtoWire.decodeMessage(got.head._2)
        assert(m.producerId == 7L && m.seq == 3L && m.groupId == 3L)
      } finally c.close()
    } finally broker.close()
  }
}
