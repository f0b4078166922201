package graft.mysql

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Shared scripted-server conversation builders for client/source specs —
  * byte layouts follow the PUBLIC protocol docs, so tests pin the wire
  * format rather than self-consistency. */
object MysqlScript {

  def frame(seq: Int, payload: Array[Byte]): Array[Byte] =
    Array[Byte](
      (payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte,
      seq.toByte) ++ payload

  val nonce1: Array[Byte] = (1 to 8).map(_.toByte).toArray
  val nonce2: Array[Byte] = (9 to 20).map(_.toByte).toArray
  val nonce: Array[Byte] = nonce1 ++ nonce2

  /** Protocol::HandshakeV10, as documented. */
  def greeting: Array[Byte] = {
    val w = new Packets.Writer
    w.u8(10)
    w.nulStr("8.0.99-test")
    w.u32(42) // thread id
    w.raw(nonce1)
    w.u8(0) // filler
    w.u16(0x8200 | 0x0002) // caps low: PROTOCOL_41 | SECURE_CONNECTION
    w.u8(33) // charset
    w.u16(2) // status
    w.u16(0x0008) // caps high: PLUGIN_AUTH
    w.u8(21) // auth data len (8 + 12 + NUL)
    w.zeros(10)
    w.raw(nonce2); w.u8(0)
    w.nulStr("mysql_native_password")
    w.result
  }

  def okPacket: Array[Byte] =
    new Packets.Writer().u8(0).u8(0).u8(0).u16(2).u16(0).result

  def eofPacket: Array[Byte] =
    new Packets.Writer().u8(0xfe).u16(0).u16(2).result

  /** ERR_Packet: header 0xff, error code, '#' + 5-byte SQL state, message. */
  def errPacket(code: Int, message: String): Array[Byte] = {
    val w = new Packets.Writer
    w.u8(0xff); w.u16(code); w.u8('#'.toInt)
    w.eofStr("HY000"); w.eofStr(message)
    w.result
  }

  def colDef(name: String): Array[Byte] = {
    val w = new Packets.Writer
    def ls(s: String): Unit = { w.lenenc(s.getBytes(UTF_8).length.toLong); w.eofStr(s) }
    ls("def"); ls(""); ls(""); ls(""); ls(name)
    ls(name); w.u8(0x0c); w.u16(33); w.u32(255); w.u8(253); w.u16(0); w.u8(0); w.u16(0)
    w.result
  }

  def textRow(values: Option[String]*): Array[Byte] = {
    val w = new Packets.Writer
    values.foreach {
      case Some(s) => w.lenenc(s.getBytes(UTF_8).length.toLong); w.eofStr(s)
      case None => w.u8(0xfb)
    }
    w.result
  }

  /** One binlog stream packet: 0x00 ++ 19-byte header ++ payload [++ crc]. */
  def eventPacket(tpe: Int, logPos: Long, payload: Array[Byte],
      crc: Boolean, timestamp: Long = 1546300800L, serverId: Long = 77L): Array[Byte] = {
    val size = 19 + payload.length + (if (crc) 4 else 0)
    val w = new Packets.Writer
    w.u8(0) // network stream OK byte
    w.u32(timestamp); w.u8(tpe); w.u32(serverId); w.u32(size); w.u32(logPos); w.u16(0)
    w.raw(payload)
    if (crc) w.u32(0xdeadbeefL) // CRC value itself is not verified
    w.result
  }

  def fdePayload(alg: Int): Array[Byte] = {
    val w = new Packets.Writer
    w.u16(4)
    val sv = "8.0.99-test".getBytes(UTF_8)
    w.raw(sv); w.zeros(50 - sv.length)
    w.u32(0); w.u8(19)
    w.zeros(39) // post-header length table (content irrelevant here)
    w.u8(alg)
    w.result // the +4 crc is appended by eventPacket
  }

  /** Resultset conversation for SHOW GLOBAL VARIABLES LIKE "binlog_format". */
  def binlogFormatResult(value: String): Seq[Array[Byte]] = Seq(
    frame(1, new Packets.Writer().lenenc(2L).result),
    frame(2, colDef("Variable_name")), frame(3, colDef("Value")),
    frame(4, eofPacket),
    frame(5, textRow(Some("binlog_format"), Some(value))),
    frame(6, eofPacket))

  def binlogRowImageResult(value: String): Seq[Array[Byte]] = Seq(
    frame(1, new Packets.Writer().lenenc(2L).result),
    frame(2, colDef("Variable_name")), frame(3, colDef("Value")),
    frame(4, eofPacket),
    frame(5, textRow(Some("binlog_row_image"), Some(value))),
    frame(6, eofPacket))

  /** A pre-5.6 server: the variable does not exist, SHOW returns an empty
    * resultset (column defs, then straight to the terminating EOF). */
  def binlogRowImageAbsent: Seq[Array[Byte]] = Seq(
    frame(1, new Packets.Writer().lenenc(2L).result),
    frame(2, colDef("Variable_name")), frame(3, colDef("Value")),
    frame(4, eofPacket),
    frame(5, eofPacket))

  /** Responses to the client's checksum announce (issued before every
    * dump): OK for the SET, then the 1-row resultset for
    * SELECT @@global.binlog_checksum. */
  def checksumAnnounce(value: String): Seq[Array[Byte]] = Seq(
    frame(1, okPacket),
    frame(1, new Packets.Writer().lenenc(1L).result),
    frame(2, colDef("@@global.binlog_checksum")),
    frame(3, eofPacket),
    frame(4, textRow(Some(value))),
    frame(5, eofPacket))

  def script(packets: Array[Byte]*): (ByteArrayInputStream, ByteArrayOutputStream) =
    (new ByteArrayInputStream(packets.flatten.toArray), new ByteArrayOutputStream())
}
