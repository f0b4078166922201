package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** The magic-2 RecordBatch dialect, proved the same three ways as v1:
  * golden bytes hand-assembled from the published layout (zigzag varints,
  * CRC-32C placement), broker round-trips over Produce v3 / Fetch v4, and
  * cross-dialect interop (one log serves both formats, like a real
  * broker's up/down-conversion). */
class KafkaWireV2Spec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("zigzag varints match the published encoding (golden pairs)") {
    // the protobuf sint pairs the Kafka guide references
    val cases = Seq(0L -> "00", -1L -> "01", 1L -> "02", -2L -> "03",
      2L -> "04", 149L -> "aa02", -150L -> "ab02", 2147483647L -> "feffffff0f",
      -2147483648L -> "ffffffff0f")
    cases.foreach { case (v, expect) =>
      val w = new KafkaWire.Writer()
      KafkaWireV2.writeVarLong(w, v)
      assert(hex(w.result) == expect, s"encode $v")
      assert(KafkaWireV2.readVarLong(new KafkaWire.Reader(unhex(expect))) == v)
      assert(KafkaWireV2.varLongSize(v) == expect.length / 2)
    }
  }

  test("RecordBatch v2 layout and CRC-32C match the published format (golden bytes)") {
    // one record: baseOffset 5, timestamp 1000, no key, value "hi"
    // record body: attrs 00 | tsDelta 00 | offsetDelta 00 | keyLen -1 (01)
    //            | valueLen 2 (04) | "hi" | headerCount 00
    val recordBody = "00" + "00" + "00" + "01" + "04" + "6869" + "00"
    val record = "10" + recordBody // length 8 → zigzag varint 0x10
    // after-crc section: attributes 0000 | lastOffsetDelta 00000000
    // | firstTs 1000 | maxTs 1000 | producerId -1 | producerEpoch -1
    // | baseSequence -1 | recordCount 1 | record
    val tail = "0000" + "00000000" +
      "00000000000003e8" + "00000000000003e8" +
      "ffffffffffffffff" + "ffff" + "ffffffff" +
      "00000001" + record
    val crc = new java.util.zip.CRC32C()
    crc.update(unhex(tail))
    // batch: baseOffset 5 | batchLength (9 + |tail|) | leaderEpoch -1
    // | magic 2 | crc | tail
    val expected = "0000000000000005" +
      f"${9 + tail.length / 2}%08x" + "ffffffff" + "02" +
      f"${crc.getValue.toInt}%08x" + tail
    val got = KafkaWireV2.encodeRecordBatch(Seq(
      KafkaWire.Msg(5L, 1000L, null, "hi".getBytes("UTF-8"))))
    assert(hex(got) == expected)
    // and it decodes back, CRC-verified
    val decoded = KafkaWireV2.decodeRecordBatches(got)
    assert(decoded.map(m => (m.offset, m.timestamp, new String(m.value))) ==
      Vector((5L, 1000L, "hi")))
  }

  test("batch decode verifies CRC-32C and rejects corruption; partial tail dropped") {
    val good = KafkaWireV2.encodeRecordBatch(Seq(
      KafkaWire.Msg(0L, 1L, "k".getBytes, "v".getBytes),
      KafkaWire.Msg(1L, 2L, null, "w".getBytes)))
    val decoded = KafkaWireV2.decodeRecordBatches(good)
    assert(decoded.map(m => (m.offset, Option(m.key).map(new String(_)), new String(m.value))) ==
      Vector((0L, Some("k"), "v"), (1L, None, "w")))
    val corrupt = good.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException] { KafkaWireV2.decodeRecordBatches(corrupt) }
    // a batch truncated mid-way (byte-limited fetch) is dropped silently
    assert(KafkaWireV2.decodeRecordBatches(good.take(good.length - 3)).size < 2)
  }

  test("Produce v3 and Fetch v4 frames round-trip") {
    val set = KafkaWireV2.encodeRecordBatch(Seq(KafkaWire.Msg(0L, 7L, null, "x".getBytes)))
    val pq = KafkaWire.ProduceRequest(-1, 1500, "t", 0, set)
    val pd = KafkaWireV2.decodeProduceRequestV3(
      new KafkaWire.Reader(KafkaWireV2.encodeProduceRequestV3(pq)))
    assert(pd.topic == "t" && pd.acks == -1 && pd.messageSet.sameElements(set))
    val fq = KafkaWire.FetchRequest(500, 1, 1 << 20, "t", 0, 9L, 1 << 20)
    assert(KafkaWireV2.decodeFetchRequestV4(
      new KafkaWire.Reader(KafkaWireV2.encodeFetchRequestV4(fq))) == fq)
    val fr = KafkaWire.FetchResponse(0, "t", 0, 0, 11L, set)
    val frd = KafkaWireV2.decodeFetchResponseV4(
      new KafkaWire.Reader(KafkaWireV2.encodeFetchResponseV4(fr)))
    assert(frd.highWatermark == 11L && frd.messageSet.sameElements(set))
  }

  test("v2 client against the broker: produce, hwm, paged fetch") {
    val broker = new KafkaBroker().start()
    try {
      val c = new KafkaTopicClient("127.0.0.1", broker.port, "ops", messageFormat = 2)
      try {
        assert(c.produce("a".getBytes) == 1L)
        assert(c.produce("b".getBytes) == 2L)
        assert(c.highWaterMark() == 2L)
        assert(c.fetchFrom(0L).map(p => new String(p._2)) == Vector("a", "b"))
      } finally c.close()
      // paging under a byte limit: many fetch rounds, no gaps or dups
      val writer = new KafkaTopicClient("127.0.0.1", broker.port, "big", messageFormat = 2)
      val payloads = (0 until 40).map(i => s"payload-$i-${"x" * 100}")
      try payloads.foreach(p => writer.produce(p.getBytes)) finally writer.close()
      val reader = new KafkaTopicClient("127.0.0.1", broker.port, "big",
        fetchMaxBytes = 256, messageFormat = 2)
      try {
        val got = reader.fetchFrom(0L)
        assert(got.map(_._1) == (0L until 40L).toVector)
        assert(got.map(p => new String(p._2)) == payloads.toVector)
      } finally reader.close()
    } finally broker.close()
  }

  test("cross-dialect interop: v1-produced messages fetch as v2 batches and vice versa") {
    val broker = new KafkaBroker().start()
    try {
      val v1 = new KafkaTopicClient("127.0.0.1", broker.port, "ops")
      val v2 = new KafkaTopicClient("127.0.0.1", broker.port, "ops", messageFormat = 2)
      try {
        v1.produce("from-v1".getBytes)
        v2.produce("from-v2".getBytes)
        val viaV1 = v1.fetchFrom(0L).map(p => (p._1, new String(p._2)))
        val viaV2 = v2.fetchFrom(0L).map(p => (p._1, new String(p._2)))
        assert(viaV1 == Vector((0L, "from-v1"), (1L, "from-v2")))
        assert(viaV2 == viaV1)
      } finally { v1.close(); v2.close() }
    } finally broker.close()
  }

  test("broker rejects a TRUNCATED v3 produce batch instead of acking dropped records") {
    val broker = new KafkaBroker().start()
    try {
      val set = KafkaWireV2.encodeRecordBatch(Seq(
        KafkaWire.Msg(0L, 1L, null, "payload".getBytes))).dropRight(3)
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiProduce, 3, 1, "t"))
        w.raw(KafkaWireV2.encodeProduceRequestV3(
          KafkaWire.ProduceRequest(-1, 1000, "ops", 0, set)))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        r.i32()
        val resp = KafkaWire.decodeProduceResponse(r)
        assert(resp.errorCode == KafkaWire.ErrCorruptMessage)
        assert(broker.highWaterMark("ops", 0) == 0L)
      } finally sock.close()
    } finally broker.close()
  }

  test("broker rejects a CRC-corrupted v3 produce with ErrCorruptMessage") {
    val broker = new KafkaBroker().start()
    try {
      val set = KafkaWireV2.encodeRecordBatch(Seq(
        KafkaWire.Msg(0L, 1L, null, "payload".getBytes)))
      set(set.length - 1) = (set(set.length - 1) ^ 0x01).toByte
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val w = new KafkaWire.Writer()
        KafkaWire.writeRequestHeader(w,
          KafkaWire.RequestHeader(KafkaWire.ApiProduce, 3, 1, "t"))
        w.raw(KafkaWireV2.encodeProduceRequestV3(
          KafkaWire.ProduceRequest(-1, 1000, "ops", 0, set)))
        KafkaWire.writeFrame(out, w.result)
        val r = new KafkaWire.Reader(KafkaWire.readFrame(in))
        assert(r.i32() == 1)
        val resp = KafkaWire.decodeProduceResponse(r)
        assert(resp.errorCode == KafkaWire.ErrCorruptMessage)
        assert(broker.highWaterMark("ops", 0) == 0L)
      } finally sock.close()
    } finally broker.close()
  }
}
