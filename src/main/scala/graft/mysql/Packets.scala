package graft.mysql

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** MySQL client/server wire protocol primitives (public protocol:
  * dev.mysql.com/doc/dev/mysql-server — "MySQL Packets" + basic types).
  * Everything is little-endian; strings are NUL-terminated, length-encoded,
  * or end-of-packet. The reference consumes this protocol through
  * go-mysql's `client`/`replication` packages; this is the ground-up Scala
  * equivalent for the live source (S1/S2/S3 front door).
  */
object Packets {

  /** One framed packet: 3-byte LE length + 1-byte sequence + payload.
    * A payload of exactly 0xffffff bytes continues in the next packet
    * (the protocol's multi-packet rule — without reassembly a >=16MB
    * binlog event would be parsed as two independent events, the first
    * truncated and the second garbage); the returned seq is the LAST
    * fragment's, so the caller's sequence tracking stays aligned. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    def one(): (Int, Array[Byte]) = {
      val hdr = readN(in, 4)
      val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
      val seq = hdr(3) & 0xff
      (seq, readN(in, len))
    }
    var (seq, payload) = one()
    if (payload.length == 0xffffff) {
      val acc = new ByteArrayOutputStream()
      acc.write(payload)
      var last = payload
      while (last.length == 0xffffff) {
        val (s, p) = one()
        seq = s; last = p
        acc.write(p)
      }
      payload = acc.toByteArray
    }
    (seq, payload)
  }

  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    require(payload.length < 0xffffff, "multi-packet payloads not needed here")
    out.write(Array[Byte](
      (payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte,
      (seq & 0xff).toByte))
    out.write(payload)
    out.flush()
  }

  def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"stream closed after $off of $n bytes")
      off += r
    }
    buf
  }

  /** Little-endian cursor over one packet payload. */
  final class Reader(val buf: Array[Byte]) {
    private var p = 0
    def pos: Int = p
    def remaining: Int = buf.length - p
    def hasNext: Boolean = p < buf.length
    def skip(n: Int): Unit = p += n
    def u8(): Int = { val v = buf(p) & 0xff; p += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u24().toLong | ((u8().toLong) << 24)
    def u48(): Long = u32() | ((u16().toLong) << 32)
    def u64(): Long = { var v = 0L; var i = 0; while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }; v }
    /** Big-endian fixed int (binlog packed temporals use BE). */
    def beInt(n: Int): Long = { var v = 0L; var i = 0; while (i < n) { v = (v << 8) | u8(); i += 1 }; v }
    def bytes(n: Int): Array[Byte] = { val b = java.util.Arrays.copyOfRange(buf, p, p + n); p += n; b }
    def restBytes(): Array[Byte] = bytes(buf.length - p)
    def restString(): String = new String(restBytes(), UTF_8)
    def nulString(): String = {
      val start = p
      while (buf(p) != 0) p += 1
      val s = new String(buf, start, p - start, UTF_8)
      p += 1 // NUL
      s
    }
    /** Length-encoded integer; None = 0xFB NULL marker. */
    def lenencOpt(): Option[Long] = u8() match {
      case 0xfb => None
      case 0xfc => Some(u16().toLong)
      case 0xfd => Some(u24().toLong)
      case 0xfe => Some(u64())
      case v => Some(v.toLong)
    }
    def lenenc(): Long = lenencOpt().getOrElse(
      throw new IllegalStateException("unexpected NULL lenenc int"))
    def lenencString(): String = new String(bytes(lenenc().toInt), UTF_8)
    def lenencStringOpt(): Option[String] = lenencOpt().map(n => new String(bytes(n.toInt), UTF_8))
  }

  /** Little-endian payload builder. */
  final class Writer {
    private val bos = new ByteArrayOutputStream()
    def u8(v: Int): Writer = { bos.write(v & 0xff); this }
    def u16(v: Int): Writer = { u8(v); u8(v >> 8) }
    def u24(v: Int): Writer = { u16(v); u8(v >> 16) }
    def u32(v: Long): Writer = { u24(v.toInt); u8((v >> 24).toInt) }
    def u64(v: Long): Writer = { var i = 0; while (i < 8) { u8((v >> (8 * i)).toInt); i += 1 }; this }
    def raw(b: Array[Byte]): Writer = { bos.write(b); this }
    def nulStr(s: String): Writer = { raw(s.getBytes(UTF_8)); u8(0) }
    def eofStr(s: String): Writer = raw(s.getBytes(UTF_8))
    def lenenc(v: Long): Writer =
      if (v < 0xfb) u8(v.toInt)
      else if (v < 0x10000) { u8(0xfc); u16(v.toInt) }
      else if (v < 0x1000000) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def lenencBytes(b: Array[Byte]): Writer = { lenenc(b.length.toLong); raw(b) }
    def zeros(n: Int): Writer = { var i = 0; while (i < n) { u8(0); i += 1 }; this }
    def result: Array[Byte] = bos.toByteArray
  }

  // command bytes (public protocol constants)
  val COM_QUIT = 0x01
  val COM_QUERY = 0x03
  val COM_PING = 0x0e
  val COM_BINLOG_DUMP = 0x12
  val COM_REGISTER_SLAVE = 0x15
  val COM_BINLOG_DUMP_GTID = 0x1e

  // COM_BINLOG_DUMP_GTID flags
  val BINLOG_THROUGH_GTID = 0x04

  // capability flags (subset we negotiate)
  val CLIENT_LONG_PASSWORD = 0x00000001L
  val CLIENT_LONG_FLAG = 0x00000004L
  val CLIENT_PROTOCOL_41 = 0x00000200L
  val CLIENT_TRANSACTIONS = 0x00002000L
  val CLIENT_SECURE_CONNECTION = 0x00008000L
  val CLIENT_PLUGIN_AUTH = 0x00080000L
}
