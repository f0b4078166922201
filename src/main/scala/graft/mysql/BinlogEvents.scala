package graft.mysql

import java.nio.charset.StandardCharsets.UTF_8

/** Binlog event parsing (public replication protocol:
  * dev.mysql.com/doc/dev/mysql-server "Binlog Event"; the reference reads
  * the same stream through go-mysql's `replication` package — behavioral
  * anchor /root/reference/canal/sync.go:69-225).
  *
  * Covered: ROTATE, FORMAT_DESCRIPTION (incl. CRC32 checksum detection),
  * QUERY, XID, GTID, HEARTBEAT (T8), TABLE_MAP and WRITE/UPDATE/DELETE
  * ROWS v1/v2 for the full column-type matrix: ints, float/double,
  * varchar/string, blob, date, classic+v2 temporals (TIME/TIME2,
  * DATETIME/DATETIME2, TIMESTAMP/TIMESTAMP2), year, newdecimal, BIT,
  * ENUM/SET (real type unpacked from STRING packed meta), binary JSON
  * (JsonBinary) and GEOMETRY. Anything genuinely unknown still fails
  * loudly — a silent wrong decode would corrupt the change stream.
  */
object BinlogEvents {

  // event type codes (public protocol)
  val QUERY_EVENT = 2
  val ROTATE_EVENT = 4
  val FORMAT_DESCRIPTION_EVENT = 15
  val XID_EVENT = 16
  val TABLE_MAP_EVENT = 19
  val HEARTBEAT_EVENT = 27
  val WRITE_ROWS_V1 = 23
  val UPDATE_ROWS_V1 = 24
  val DELETE_ROWS_V1 = 25
  val WRITE_ROWS_V2 = 30
  val UPDATE_ROWS_V2 = 31
  val DELETE_ROWS_V2 = 32
  val GTID_EVENT = 33
  val MARIADB_GTID_EVENT = 162 // MariaDB flavor: per-domain (domain, seq)

  final case class EventHeader(
      timestamp: Long, eventType: Int, serverId: Long,
      eventSize: Long, logPos: Long, flags: Int)

  sealed trait Event
  final case class Rotate(position: Long, nextLogName: String) extends Event
  final case class FormatDescription(
      binlogVersion: Int, serverVersion: String, checksumAlg: Int) extends Event
  final case class Query(threadId: Long, schema: String, query: String) extends Event
  final case class Xid(xid: Long) extends Event
  final case class Gtid(uuid: String, gno: Long) extends Event
  /** MariaDB GTID_EVENT (0xa2): the server component comes from the common
    * header's serverId, so the full GTID is `domain-serverId-seq`. */
  final case class MariadbGtid(domain: Long, seq: Long) extends Event
  final case class Heartbeat(logIdent: String) extends Event
  final case class TableMap(
      tableId: Long, schema: String, table: String,
      columnTypes: Array[Int], columnMeta: Array[Int]) extends Event
  /** kind: "insert" | "update" | "delete"; each row is (before, after). */
  final case class Rows(
      tableId: Long, kind: String,
      rows: Vector[(Option[Vector[Option[String]]], Option[Vector[Option[String]]])]) extends Event
  final case class Unsupported(eventType: Int, payload: Array[Byte]) extends Event

  /** Parse the 19-byte common header. */
  def parseHeader(r: Packets.Reader): EventHeader =
    EventHeader(r.u32(), r.u8(), r.u32(), r.u32(), r.u32(), r.u16())

  /** Parse one event payload (checksum already stripped by the caller).
    * `tables` resolves TABLE_MAP registrations for rows events. */
  def parseEvent(header: EventHeader, r: Packets.Reader,
      tables: collection.Map[Long, TableMap]): Event = header.eventType match {

    case ROTATE_EVENT =>
      val pos = r.u64()
      Rotate(pos, r.restString())

    case FORMAT_DESCRIPTION_EVENT =>
      val ver = r.u16()
      val serverVersion = new String(r.bytes(50), UTF_8).takeWhile(_ != 0)
      r.skip(4) // create timestamp
      r.skip(1) // header length
      // post-header lengths array fills the rest; the checksum algorithm is
      // the byte 5 from the end (alg + 4-byte checksum of this event)
      val alg = if (r.remaining >= 5) r.buf(r.buf.length - 5) & 0xff else 0
      FormatDescription(ver, serverVersion, alg)

    case QUERY_EVENT =>
      val threadId = r.u32()
      r.skip(4) // exec time
      val schemaLen = r.u8()
      r.skip(2) // error code
      val statusLen = r.u16()
      r.skip(statusLen)
      val schema = new String(r.bytes(schemaLen), UTF_8)
      r.skip(1) // NUL
      Query(threadId, schema, r.restString())

    case XID_EVENT =>
      Xid(r.u64())

    case GTID_EVENT =>
      r.skip(1) // flags
      val sid = r.bytes(16)
      val uuid = f"${hex(sid, 0, 4)}-${hex(sid, 4, 2)}-${hex(sid, 6, 2)}-${hex(sid, 8, 2)}-${hex(sid, 10, 6)}"
      Gtid(uuid, r.u64())

    case MARIADB_GTID_EVENT =>
      // public MariaDB layout: u64 LE sequence number, u32 LE domain id,
      // u8 flags2 (+ optional commit id) — server id is in the header
      val seq = r.u64()
      MariadbGtid(r.u32(), seq)

    case HEARTBEAT_EVENT =>
      Heartbeat(r.restString())

    case TABLE_MAP_EVENT =>
      val tableId = r.u48()
      r.skip(2) // flags
      val schema = new String(r.bytes(r.u8()), UTF_8); r.skip(1)
      val table = new String(r.bytes(r.u8()), UTF_8); r.skip(1)
      val n = r.lenenc().toInt
      val types = Array.fill(n)(r.u8())
      val metaBlock = new Packets.Reader(r.bytes(r.lenenc().toInt))
      val meta = types.map(t => readMeta(t, metaBlock))
      // null bitmap follows; names are NOT in the binlog — the schema
      // mirror supplies them (SchemaTracker, §1.3)
      TableMap(tableId, schema, table, types, meta)

    case WRITE_ROWS_V1 | WRITE_ROWS_V2 | UPDATE_ROWS_V1 | UPDATE_ROWS_V2 |
        DELETE_ROWS_V1 | DELETE_ROWS_V2 =>
      parseRows(header.eventType, r, tables)

    case _ =>
      Unsupported(header.eventType, r.restBytes())
  }

  private def hex(b: Array[Byte], off: Int, len: Int): String =
    b.slice(off, off + len).map(x => f"${x & 0xff}%02x").mkString

  /** Per-type metadata width in TABLE_MAP (public protocol table). */
  private def readMeta(colType: Int, r: Packets.Reader): Int = colType match {
    case 15 => r.u16() // VARCHAR: max length
    case 253 => r.u16() // VAR_STRING
    case 254 | 247 | 248 => (r.u8() << 8) | r.u8() // STRING/ENUM/SET: packed
    case 249 | 250 | 251 | 252 => r.u8() // BLOBs: length-byte count
    case 246 => (r.u8() << 8) | r.u8() // NEWDECIMAL: precision, scale
    case 4 | 5 => r.u8() // FLOAT/DOUBLE: size
    case 16 => (r.u8() << 8) | r.u8() // BIT: bits%8, bits/8
    case 17 | 18 | 19 => r.u8() // TIMESTAMP2/DATETIME2/TIME2: fsp
    case 245 | 255 => r.u8() // JSON/GEOMETRY: length-byte count
    case _ => 0
  }

  private def parseRows(eventType: Int, r: Packets.Reader,
      tables: collection.Map[Long, TableMap]): Rows = {
    val v2 = eventType >= WRITE_ROWS_V2
    val kind = eventType match {
      case WRITE_ROWS_V1 | WRITE_ROWS_V2 => "insert"
      case UPDATE_ROWS_V1 | UPDATE_ROWS_V2 => "update"
      case _ => "delete"
    }
    val tableId = r.u48()
    r.skip(2) // flags
    if (v2) { val extraLen = r.u16(); r.skip(extraLen - 2) }
    val tm = tables.getOrElse(tableId,
      throw new IllegalStateException(s"rows event for unmapped table id $tableId"))
    val n = r.lenenc().toInt
    val present1 = r.bytes((n + 7) / 8)
    val present2 = if (kind == "update") r.bytes((n + 7) / 8) else present1

    def bit(bm: Array[Byte], i: Int): Boolean = (bm(i / 8) & (1 << (i % 8))) != 0
    def presentCount(bm: Array[Byte]): Int = (0 until n).count(bit(bm, _))

    def image(present: Array[Byte]): Vector[Option[String]] = {
      val pc = presentCount(present)
      val nullBm = r.bytes((pc + 7) / 8)
      var j = 0 // index among present columns
      (0 until n).flatMap { i =>
        if (!bit(present, i)) None
        else {
          val v =
            if (bit(nullBm, j)) None
            else Some(readValue(tm.columnTypes(i), tm.columnMeta(i), r))
          j += 1
          Some(v)
        }
      }.toVector
    }

    val out = Vector.newBuilder[(Option[Vector[Option[String]]], Option[Vector[Option[String]]])]
    while (r.hasNext) {
      kind match {
        case "insert" => out += ((None, Some(image(present1))))
        case "delete" => out += ((Some(image(present1)), None))
        case "update" =>
          val before = image(present1)
          val after = image(present2)
          out += ((Some(before), Some(after)))
      }
    }
    Rows(tableId, kind, out.result())
  }

  /** Decode one non-null column value to its string form (the model is
    * stringly — P3; unsigned reinterpretation happens downstream against
    * the schema mirror — P2). */
  private[mysql] def readValue(colType: Int, meta: Int, r: Packets.Reader): String = colType match {
    case 1 => r.u8().toByte.toLong.toString // TINY (signed)
    case 2 => r.u16().toShort.toLong.toString // SHORT
    case 9 => // INT24 signed
      val v = r.u24()
      (if ((v & 0x800000) != 0) v - 0x1000000 else v).toString
    case 3 => r.u32().toInt.toLong.toString // LONG
    case 8 => r.u64().toString // LONGLONG (signed)
    case 13 => (1900 + r.u8()).toString // YEAR
    case 4 => java.lang.Float.intBitsToFloat(r.u32().toInt).toString // FLOAT
    case 5 => java.lang.Double.longBitsToDouble(r.u64()).toString // DOUBLE
    case 15 | 253 => // VARCHAR / VAR_STRING: meta = max length
      val len = if (meta > 255) r.u16() else r.u8()
      new String(r.bytes(len), UTF_8)
    case 254 | 247 | 248 => // STRING family: packed meta b0 = real type, b1 = length
      // CHAR >255 bytes steals bits from b0; ENUM/SET arrive with their real
      // type in b0 (the TABLE_MAP writes them under STRING) — unpack before
      // choosing the length decode, or a 2-byte ENUM reads the wrong width.
      val b0 = (meta >> 8) & 0xff; val b1 = meta & 0xff
      val (realType, maxLen) =
        if ((b0 & 0x30) != 0x30) (b0 | 0x30, b1 | (((b0 & 0x30) ^ 0x30) << 4))
        else (b0, b1)
      realType match {
        case 247 => // ENUM: 1- or 2-byte little-endian 1-based index
          (if (maxLen == 1) r.u8() else r.u16()).toString
        case 248 => // SET: maxLen-byte little-endian member bitmask
          var v = 0L; var i = 0
          while (i < maxLen) { v |= (r.u8().toLong << (8 * i)); i += 1 }
          java.lang.Long.toUnsignedString(v)
        case _ => // CHAR/BINARY
          val len = if (maxLen > 255) r.u16() else r.u8()
          new String(r.bytes(len), UTF_8)
      }
    case 249 | 250 | 251 | 252 => // BLOB family: meta = length-byte count
      new String(r.bytes(blobLen(meta, r)), UTF_8)
    case 245 => // JSON: blob-framed binary JSON document
      JsonBinary.decode(r.bytes(blobLen(meta, r)))
    case 255 => // GEOMETRY: blob-framed WKB+SRID; hex render (binary payload)
      r.bytes(blobLen(meta, r)).map(b => f"${b & 0xff}%02x").mkString
    case 16 => // BIT: meta hi = bits%8, lo = bits/8 (readMeta order); BE bytes
      val nbits = (meta >> 8) + (meta & 0xff) * 8
      java.lang.Long.toUnsignedString(r.beInt((nbits + 7) / 8))
    case 10 | 14 => // DATE/NEWDATE: 3 bytes, day 5 bits, month 4, year rest
      val v = r.u24()
      f"${v >> 9}%04d-${(v >> 5) & 0xf}%02d-${v & 0x1f}%02d"
    case 7 => r.u32().toString // classic TIMESTAMP: epoch seconds (TIMESTAMP2 parity)
    case 11 => // classic TIME: 3 bytes LE SIGNED int24, hh*10000 + mm*100 + ss
      var v = r.u24().toLong
      if ((v & 0x800000L) != 0) v |= ~0xffffffL // sign-extend: negative TIME
      val sign = if (v < 0) "-" else ""
      val a = math.abs(v)
      f"$sign${a / 10000}%02d:${(a / 100) % 100}%02d:${a % 100}%02d"
    case 12 => // classic DATETIME: u64 = YYYYMMDD * 1e6 + HHMMSS
      val v = r.u64()
      val d = v / 1000000; val t = v % 1000000
      f"${d / 10000}%04d-${(d / 100) % 100}%02d-${d % 100}%02d " +
        f"${t / 10000}%02d:${(t / 100) % 100}%02d:${t % 100}%02d"
    case 19 => readTime2(meta, r) // TIME2: meta = fsp
    case 18 => // DATETIME2: 5 bytes BE packed + fractional
      val raw = r.beInt(5) - 0x8000000000L
      val sec = raw & 0x3f
      val min = (raw >> 6) & 0x3f
      val hour = (raw >> 12) & 0x1f
      val day = (raw >> 17) & 0x1f
      val ym = (raw >> 22) & 0x1ffff
      skipFsp(meta, r)
      f"${ym / 13}%04d-${ym % 13}%02d-$day%02d $hour%02d:$min%02d:$sec%02d"
    case 17 => // TIMESTAMP2: 4 bytes BE epoch seconds + fractional
      val secs = r.beInt(4)
      skipFsp(meta, r)
      secs.toString
    case 246 => readNewDecimal(meta >> 8, meta & 0xff, r) // NEWDECIMAL
    case other =>
      throw new UnsupportedOperationException(
        s"binlog column type $other not supported by this decoder")
  }

  private def skipFsp(fsp: Int, r: Packets.Reader): Unit = r.skip((fsp + 1) / 2)

  /** Blob-framed length: meta = how many bytes encode the payload length. */
  private def blobLen(meta: Int, r: Packets.Reader): Int = meta match {
    case 1 => r.u8()
    case 2 => r.u16()
    case 3 => r.u24()
    case _ => r.u32().toInt
  }

  /** TIME2: offset-binary 3-byte BE intpart (1 sign + 2 pad + 10 hour +
    * 6 min + 6 sec) plus 0–3 fractional bytes by fsp; negative values use
    * two's-complement borrow against the fraction (public format:
    * mysql-server my_time.cc TIME_from/to_longlong_time_packed). */
  private def readTime2(fsp: Int, r: Packets.Reader): String = {
    val intOfs = 0x800000L
    val ofs6 = 0x800000000000L
    var tmp = 0L
    fsp match {
      case 1 | 2 =>
        var intPart = r.beInt(3) - intOfs
        var frac = r.u8().toLong
        if (intPart < 0 && frac != 0) { intPart += 1; frac -= 0x100 }
        tmp = (intPart << 24) + frac * 10000
      case 3 | 4 =>
        var intPart = r.beInt(3) - intOfs
        var frac = r.beInt(2)
        if (intPart < 0 && frac != 0) { intPart += 1; frac -= 0x10000 }
        tmp = (intPart << 24) + frac * 100
      case 5 | 6 =>
        tmp = r.beInt(6) - ofs6
      case _ =>
        tmp = (r.beInt(3) - intOfs) << 24
    }
    val sign = if (tmp < 0) "-" else ""
    val a = math.abs(tmp)
    val hms = a >> 24
    val micro = a % (1 << 24)
    val base = f"$sign${(hms >> 12) & 0x3ff}%02d:${(hms >> 6) & 0x3f}%02d:${hms & 0x3f}%02d"
    if (fsp > 0) {
      var scale = 1L; var i = 0
      while (i < 6 - fsp) { scale *= 10; i += 1 }
      base + "." + s"%0${fsp}d".format(micro / scale)
    } else base
  }

  /** NEWDECIMAL: sign-flipped big-endian base-10^9 groups of 9 digits
    * packed into 4-byte words, with compressed leading/trailing groups
    * (public format: strings/decimal.c bin2decimal layout). */
  private[mysql] def readNewDecimal(precision: Int, scale: Int, r: Packets.Reader): String = {
    val digitsPerWord = 9
    val wordBytes = 4
    val leftoverBytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val intDigits = precision - scale
    val intWords = intDigits / digitsPerWord
    val intLeft = intDigits % digitsPerWord
    val fracWords = scale / digitsPerWord
    val fracLeft = scale % digitsPerWord
    val total = leftoverBytes(intLeft) + intWords * wordBytes +
      fracWords * wordBytes + leftoverBytes(fracLeft)
    val raw = r.bytes(total)
    val negative = (raw(0) & 0x80) == 0
    raw(0) = (raw(0) ^ 0x80).toByte
    if (negative) for (i <- raw.indices) raw(i) = (~raw(i)).toByte
    val rr = new Packets.Reader(raw)
    val sb = new StringBuilder
    if (negative) sb.append('-')
    // render ALL integer groups zero-padded, then strip the leading
    // zeros of the concatenation — padding only groups after a non-empty
    // builder would keep a ZERO leading group (e.g. DECIMAL(12,2) holding
    // 1.50 has intLeft group 0, word 1) and emit "0000000001.50"
    val intRendered = new StringBuilder
    if (intLeft > 0)
      intRendered.append(s"%0${intLeft}d".format(rr.beInt(leftoverBytes(intLeft))))
    for (_ <- 0 until intWords)
      intRendered.append(f"${rr.beInt(wordBytes)}%09d")
    val intStr = intRendered.dropWhile(_ == '0')
    sb.append(if (intStr.isEmpty) "0" else intStr)
    if (scale > 0) {
      sb.append('.')
      for (_ <- 0 until fracWords) sb.append(f"${rr.beInt(wordBytes)}%09d")
      if (fracLeft > 0) {
        val w = rr.beInt(leftoverBytes(fracLeft))
        sb.append(s"%0${fracLeft}d".format(w))
      }
    }
    sb.toString
  }
}
