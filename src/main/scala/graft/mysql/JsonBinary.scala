package graft.mysql

import java.nio.charset.StandardCharsets.UTF_8

/** MySQL binary JSON ("JSONB") → JSON text decoder.
  *
  * JSON columns arrive in ROW-format binlogs in the server's binary JSON
  * format (public layout: mysql-server `sql/json_binary.h` header comment
  * documents every byte; the reference consumes the same bytes through
  * go-mysql's replication package — behavioral anchor
  * /root/reference/canal/sync.go:69-225 row dispatch).
  *
  * Output is compact JSON (`{"k":v}`, no spaces) — the pipeline's stringly
  * value model (P3) only needs a deterministic faithful rendering, not
  * MySQL's exact display formatting.
  *
  * Opaque values (type 0x0f) carry an inner MySQL field type: NEWDECIMAL is
  * decoded to its numeric string; any other opaque payload (temporal/custom)
  * renders as a quoted `"opaque(<type>):<hex>"` string — loud and lossless
  * rather than a silent wrong decode.
  */
object JsonBinary {

  def decode(data: Array[Byte]): String =
    if (data.isEmpty) "null"
    else {
      val sb = new StringBuilder
      value(data(0) & 0xff, data, 1, sb)
      sb.toString
    }

  // little-endian fixed int
  private def le(data: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v |= (data(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Variable-length int: 7 bits per byte, high bit = continuation.
    * Returns (value, bytesConsumed). */
  private def varlen(data: Array[Byte], off: Int): (Int, Int) = {
    var len = 0; var n = 0; var b = 0
    do {
      b = data(off + n) & 0xff
      len |= (b & 0x7f) << (7 * n)
      n += 1
    } while ((b & 0x80) != 0)
    (len, n)
  }

  /** Append one value whose body starts at `off`. `tpe` is the type byte. */
  private def value(tpe: Int, data: Array[Byte], off: Int, sb: StringBuilder): Unit = tpe match {
    case 0x00 => container(data, off, small = true, isObject = true, sb)
    case 0x01 => container(data, off, small = false, isObject = true, sb)
    case 0x02 => container(data, off, small = true, isObject = false, sb)
    case 0x03 => container(data, off, small = false, isObject = false, sb)
    case 0x04 => // literal
      sb.append((data(off) & 0xff) match {
        case 0x00 => "null"
        case 0x01 => "true"
        case _ => "false"
      })
    case 0x05 => sb.append(le(data, off, 2).toShort.toString) // int16
    case 0x06 => sb.append((le(data, off, 2) & 0xffff).toString) // uint16
    case 0x07 => sb.append(le(data, off, 4).toInt.toString) // int32
    case 0x08 => sb.append((le(data, off, 4) & 0xffffffffL).toString) // uint32
    case 0x09 => sb.append(le(data, off, 8).toString) // int64
    case 0x0a => sb.append(java.lang.Long.toUnsignedString(le(data, off, 8))) // uint64
    case 0x0b => sb.append(java.lang.Double.longBitsToDouble(le(data, off, 8)).toString) // double
    case 0x0c => // utf8 string: varlen + bytes
      val (len, n) = varlen(data, off)
      appendString(new String(data, off + n, len, UTF_8), sb)
    case 0x0f => // opaque: inner field type byte + varlen + payload
      val fieldType = data(off) & 0xff
      val (len, n) = varlen(data, off + 1)
      val body = java.util.Arrays.copyOfRange(data, off + 1 + n, off + 1 + n + len)
      if (fieldType == 246 && len >= 2) { // NEWDECIMAL: precision, scale, bin2decimal
        val r = new Packets.Reader(body)
        val prec = r.u8(); val scale = r.u8()
        sb.append(BinlogEvents.readNewDecimal(prec, scale, r))
      } else {
        appendString(s"opaque($fieldType):" + body.map(b => f"${b & 0xff}%02x").mkString, sb)
      }
    case other =>
      throw new UnsupportedOperationException(f"binary JSON type byte 0x$other%02x")
  }

  /** Object/array. The body starts at `off` (count field); all entry offsets
    * are relative to `off`. Small format: 2-byte counts/offsets; large: 4. */
  private def container(data: Array[Byte], off: Int, small: Boolean, isObject: Boolean,
      sb: StringBuilder): Unit = {
    val w = if (small) 2 else 4
    val count = le(data, off, w).toInt
    val headOff = off + 2 * w // skip count + total-size fields
    if (isObject) {
      sb.append('{')
      val keyEntrySize = w + 2 // key offset + 2-byte key length
      val valEntryStart = headOff + count * keyEntrySize
      var i = 0
      while (i < count) {
        if (i > 0) sb.append(',')
        val ke = headOff + i * keyEntrySize
        val keyOff = le(data, ke, w).toInt
        val keyLen = le(data, ke + w, 2).toInt
        appendString(new String(data, off + keyOff, keyLen, UTF_8), sb)
        sb.append(':')
        entry(data, off, valEntryStart + i * (1 + w), w, sb)
        i += 1
      }
      sb.append('}')
    } else {
      sb.append('[')
      var i = 0
      while (i < count) {
        if (i > 0) sb.append(',')
        entry(data, off, headOff + i * (1 + w), w, sb)
        i += 1
      }
      sb.append(']')
    }
  }

  /** One value entry: type byte + (inlined value | offset). Literals and
    * 16-bit ints are always inlined; 32-bit ints fit inline only in the
    * large format's 4-byte slot. */
  private def entry(data: Array[Byte], base: Int, entryOff: Int, w: Int,
      sb: StringBuilder): Unit = {
    val tpe = data(entryOff) & 0xff
    val inlined = tpe match {
      case 0x04 | 0x05 | 0x06 => true
      case 0x07 | 0x08 => w == 4
      case _ => false
    }
    if (inlined) value(tpe, data, entryOff + 1, sb)
    else value(tpe, data, base + le(data, entryOff + 1, w).toInt, sb)
  }

  /** JSON string literal with standard escaping. */
  private def appendString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
