package graft.kafka

/** The modern Kafka record format and the request versions that carry it —
  * RecordBatch "magic 2" (0.11+), hand-rolled from the PUBLIC protocol
  * guide (kafka.apache.org/protocol) like [[KafkaWire]]. The reference pins
  * the 0.10 dialect (message format v1); any broker from 0.11 on speaks
  * this one, so the `kafka2://` sink future-proofs K1 beyond strict parity:
  *
  *  - RecordBatch: `baseOffset INT64, batchLength INT32,
  *    partitionLeaderEpoch INT32, magic INT8 (=2), crc UINT32,
  *    attributes INT16, lastOffsetDelta INT32, firstTimestamp INT64,
  *    maxTimestamp INT64, producerId INT64, producerEpoch INT16,
  *    baseSequence INT32, recordCount INT32, records...` with crc =
  *    CRC-32C (Castagnoli) over everything AFTER the crc field — note the
  *    crc moved (v1 crc'd from magic) and the polynomial changed.
  *  - Record: `length VARINT, attributes INT8, timestampDelta VARLONG,
  *    offsetDelta VARINT, keyLength VARINT, key, valueLength VARINT,
  *    value, headerCount VARINT, headers...` — all varints ZIGZAG-encoded
  *    (protobuf sint style), lengths −1 = null.
  *  - Produce v3: adds `transactional_id NULLABLE_STRING` before acks and
  *    carries record batches; response layout unchanged from v2.
  *  - Fetch v4: adds `isolation_level INT8` to the request; the response
  *    partition block gains `last_stable_offset INT64` and a nullable
  *    `aborted_transactions` array before the record set.
  *
  * Same proof style as v1: the tests pin golden bytes against the
  * published layout, so the codec is checked against the SPEC. */
object KafkaWireV2 {
  import KafkaWire.{Msg, Reader, Writer}

  // ---- zigzag varints (the protobuf sint encoding the guide specifies) ----

  def writeVarLong(w: Writer, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zigzag
    while ((z & ~0x7fL) != 0L) { w.i8(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    w.i8(z.toInt)
  }
  def writeVarInt(w: Writer, v: Int): Unit = writeVarLong(w, v.toLong)

  def readVarLong(r: Reader): Long = {
    var z = 0L; var shift = 0
    var b = r.i8()
    while ((b & 0x80) != 0) {
      z |= (b & 0x7fL) << shift; shift += 7
      require(shift <= 63, "varlong too long")
      b = r.i8()
    }
    z |= (b & 0x7fL) << shift
    (z >>> 1) ^ -(z & 1) // un-zigzag
  }
  def readVarInt(r: Reader): Int = {
    val v = readVarLong(r)
    require(v >= Int.MinValue && v <= Int.MaxValue, s"varint out of range: $v")
    v.toInt
  }
  def varLongSize(v: Long): Int = {
    var z = (v << 1) ^ (v >> 63); var n = 1
    while ((z & ~0x7fL) != 0L) { n += 1; z >>>= 7 }
    n
  }

  // ---- RecordBatch ----

  private def crc32c(buf: Array[Byte], from: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(buf, from, buf.length - from)
    c.getValue.toInt
  }

  private def encodeRecord(m: Msg, firstTimestamp: Long, baseOffset: Long): Array[Byte] = {
    val body = new Writer()
    body.i8(0) // record attributes: unused
    writeVarLong(body, m.timestamp - firstTimestamp)
    writeVarLong(body, m.offset - baseOffset)
    if (m.key == null) writeVarInt(body, -1)
    else { writeVarInt(body, m.key.length); body.raw(m.key) }
    if (m.value == null) writeVarInt(body, -1)
    else { writeVarInt(body, m.value.length); body.raw(m.value) }
    writeVarInt(body, 0) // no headers
    val b = body.result
    val w = new Writer()
    writeVarInt(w, b.length)
    w.raw(b).result
  }

  /** One batch holding `msgs` (must be non-empty, offsets ascending from
    * msgs.head.offset). Producers use baseOffset 0 and producerId −1, like
    * an idempotence-disabled real producer; the broker serves batches
    * based at the log offset. */
  def encodeRecordBatch(msgs: Seq[Msg], producerId: Long = -1L): Array[Byte] = {
    require(msgs.nonEmpty, "empty record batch")
    val baseOffset = msgs.head.offset
    val firstTs = msgs.head.timestamp
    // everything AFTER the crc field
    val tail = new Writer()
    tail.i16(0) // attributes: no compression, CreateTime, not transactional
    tail.i32((msgs.last.offset - baseOffset).toInt) // lastOffsetDelta
    tail.i64(firstTs)
    tail.i64(msgs.map(_.timestamp).max)
    tail.i64(producerId)
    tail.i16(-1) // producerEpoch
    tail.i32(-1) // baseSequence
    tail.i32(msgs.size)
    msgs.foreach(m => tail.raw(encodeRecord(m, firstTs, baseOffset)))
    val tailBytes = tail.result
    val crc = {
      val c = new java.util.zip.CRC32C()
      c.update(tailBytes)
      c.getValue.toInt
    }
    val w = new Writer()
    w.i64(baseOffset)
    w.i32(4 + 1 + 4 + tailBytes.length) // batchLength: leaderEpoch..end
    w.i32(-1) // partitionLeaderEpoch (unassigned)
    w.i8(2) // magic
    w.i32(crc)
    w.raw(tailBytes)
    w.result
  }

  /** Decodes concatenated record batches, VERIFYING each CRC-32C.
    * `tolerateTruncation` (the default) drops a partial trailing batch
    * like real consumers must — brokers legitimately truncate FETCH
    * responses at byte limits. The broker's PRODUCE path decodes strictly:
    * a producer's batch claiming more bytes than it carries is corruption,
    * and tolerantly dropping it would ack records that were never stored. */
  def decodeRecordBatches(bytes: Array[Byte],
      tolerateTruncation: Boolean = true): Vector[Msg] = {
    val out = Vector.newBuilder[Msg]
    val r = new Reader(bytes)
    def truncated(what: String): Unit =
      if (tolerateTruncation) r.pos = bytes.length // partial tail: stop
      else throw new IllegalArgumentException(s"truncated record batch: $what")
    while (r.remaining > 0) {
      if (r.remaining < 12) { truncated(s"${r.remaining} trailing bytes") }
      else {
        val baseOffset = r.i64()
        val batchLength = r.i32()
        if (r.remaining < batchLength)
          truncated(s"batch at offset $baseOffset claims $batchLength bytes, ${r.remaining} left")
        else {
          val batch = new Reader(r.raw(batchLength))
          batch.i32() // partitionLeaderEpoch
          val magic = batch.i8()
          require(magic == 2, s"unsupported batch magic $magic")
          val crc = batch.i32()
          require(crc32c(batch.buf, batch.pos) == crc,
            s"record batch crc mismatch at offset $baseOffset")
          batch.i16() // attributes (no compression support needed)
          batch.i32() // lastOffsetDelta
          val firstTs = batch.i64()
          batch.i64() // maxTimestamp
          batch.i64(); batch.i16(); batch.i32() // producer id/epoch/baseSequence
          val n = batch.i32()
          var i = 0
          while (i < n) {
            val len = readVarInt(batch)
            val rec = new Reader(batch.raw(len))
            rec.i8() // attributes
            val tsDelta = readVarLong(rec)
            val offDelta = readVarLong(rec)
            val keyLen = readVarInt(rec)
            val key = if (keyLen < 0) null else rec.raw(keyLen)
            val valLen = readVarInt(rec)
            val value = if (valLen < 0) null else rec.raw(valLen)
            val nHeaders = readVarInt(rec)
            require(nHeaders == 0, "record headers not supported")
            out += Msg(baseOffset + offDelta, firstTs + tsDelta, key, value)
            i += 1
          }
        }
      }
    }
    out.result()
  }

  // ---- Produce v3 (transactional_id + record batches) ----

  def encodeProduceRequestV3(q: KafkaWire.ProduceRequest): Array[Byte] = {
    val w = new Writer()
    w.str(null) // transactional_id: not transactional
    w.i16(q.acks); w.i32(q.timeoutMs)
    w.i32(1); w.str(q.topic)
    w.i32(1); w.i32(q.partition)
    w.i32(q.messageSet.length); w.raw(q.messageSet) // record batch bytes
    w.result
  }

  def decodeProduceRequestV3(r: Reader): KafkaWire.ProduceRequest = {
    val txn = r.str()
    require(txn == null, "transactional produce not supported")
    val acks = r.i16(); val timeout = r.i32()
    require(r.i32() == 1, "one topic per produce")
    val topic = r.str()
    require(r.i32() == 1, "one partition per produce")
    val partition = r.i32()
    val setSize = r.i32()
    KafkaWire.ProduceRequest(acks, timeout, topic, partition, r.raw(setSize))
  }
  // Produce v3 response layout is unchanged from v2 — reuse KafkaWire's.

  // ---- Fetch v4 (isolation_level, last_stable_offset, aborted txns) ----

  def encodeFetchRequestV4(q: KafkaWire.FetchRequest): Array[Byte] = {
    val w = new Writer()
    w.i32(-1) // replica_id
    w.i32(q.maxWaitMs); w.i32(q.minBytes); w.i32(q.maxBytes)
    w.i8(0) // isolation_level: READ_UNCOMMITTED
    w.i32(1); w.str(q.topic)
    w.i32(1); w.i32(q.partition); w.i64(q.fetchOffset); w.i32(q.partitionMaxBytes)
    w.result
  }

  def decodeFetchRequestV4(r: Reader): KafkaWire.FetchRequest = {
    val replica = r.i32(); require(replica == -1, s"only consumer fetches, got replica $replica")
    val maxWait = r.i32(); val minBytes = r.i32(); val maxBytes = r.i32()
    val isolation = r.i8(); require(isolation == 0, "only READ_UNCOMMITTED supported")
    require(r.i32() == 1, "one topic per fetch")
    val topic = r.str()
    require(r.i32() == 1, "one partition per fetch")
    val partition = r.i32(); val off = r.i64(); val pmax = r.i32()
    KafkaWire.FetchRequest(maxWait, minBytes, maxBytes, topic, partition, off, pmax)
  }

  def encodeFetchResponseV4(p: KafkaWire.FetchResponse): Array[Byte] = {
    val w = new Writer()
    w.i32(p.throttleMs)
    w.i32(1); w.str(p.topic)
    w.i32(1); w.i32(p.partition); w.i16(p.errorCode); w.i64(p.highWatermark)
    w.i64(p.highWatermark) // last_stable_offset = hwm (no open transactions)
    w.i32(-1) // aborted_transactions: null array
    w.i32(p.messageSet.length); w.raw(p.messageSet)
    w.result
  }

  def decodeFetchResponseV4(r: Reader): KafkaWire.FetchResponse = {
    val throttle = r.i32()
    require(r.i32() == 1, "one topic expected")
    val topic = r.str()
    require(r.i32() == 1, "one partition expected")
    val partition = r.i32(); val err = r.i16(); val hwm = r.i64()
    r.i64() // last_stable_offset
    val nAborted = r.i32()
    require(nAborted <= 0, "aborted transactions not supported")
    val setSize = r.i32()
    KafkaWire.FetchResponse(throttle, topic, partition, err, hwm, r.raw(setSize))
  }
}
