package graft.mysql

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Connection-phase messages (public protocol: "Connection Phase
  * Packets" — Protocol::HandshakeV10, Protocol::HandshakeResponse41,
  * mysql_native_password). The reference gets this from go-mysql's
  * client.Connect; here it is explicit so the auth exchange is testable
  * against the documented byte layout. */
object Handshake {

  final case class HandshakeV10(
      serverVersion: String,
      threadId: Long,
      authPluginData: Array[Byte], // the 20-byte nonce (part1 ++ part2, NUL stripped)
      capabilities: Long,
      charset: Int,
      status: Int,
      authPluginName: String)

  /** Parse the server greeting (first packet after TCP connect). */
  def parseHandshake(payload: Array[Byte]): HandshakeV10 = {
    val r = new Packets.Reader(payload)
    val proto = r.u8()
    require(proto == 10, s"unsupported handshake protocol version $proto")
    val serverVersion = r.nulString()
    val threadId = r.u32()
    val part1 = r.bytes(8)
    r.skip(1) // filler
    val capLow = r.u16().toLong
    var charset = 0
    var status = 0
    var capHigh = 0L
    var authDataLen = 0
    var part2 = Array.emptyByteArray
    var pluginName = "mysql_native_password"
    if (r.hasNext) {
      charset = r.u8()
      status = r.u16()
      capHigh = r.u16().toLong
      authDataLen = r.u8()
      r.skip(10) // reserved
      val caps = capLow | (capHigh << 16)
      if ((caps & Packets.CLIENT_SECURE_CONNECTION) != 0) {
        // documented: max(13, authDataLen - 8) bytes, of which the last is NUL
        val n = math.max(13, authDataLen - 8)
        part2 = r.bytes(n).takeWhile(_ != 0)
      }
      if ((caps & Packets.CLIENT_PLUGIN_AUTH) != 0 && r.hasNext)
        pluginName = r.nulString()
    }
    HandshakeV10(serverVersion, threadId, part1 ++ part2,
      capLow | (capHigh << 16), charset, status, pluginName)
  }

  /** mysql_native_password: SHA1(pass) XOR SHA1(nonce ++ SHA1(SHA1(pass))). */
  def nativePasswordScramble(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    def sha1(bs: Array[Byte]*): Array[Byte] = {
      val md = MessageDigest.getInstance("SHA-1")
      bs.foreach(md.update)
      md.digest()
    }
    val p1 = sha1(password.getBytes(UTF_8))
    val p2 = sha1(nonce, sha1(p1))
    p1.zip(p2).map { case (a, b) => (a ^ b).toByte }
  }

  /** Build Protocol::HandshakeResponse41. */
  def response41(user: String, password: String, nonce: Array[Byte],
      database: Option[String] = None): Array[Byte] = {
    val CLIENT_CONNECT_WITH_DB = 0x00000008L
    val caps = Packets.CLIENT_LONG_PASSWORD | Packets.CLIENT_LONG_FLAG |
      Packets.CLIENT_PROTOCOL_41 | Packets.CLIENT_TRANSACTIONS |
      Packets.CLIENT_SECURE_CONNECTION | Packets.CLIENT_PLUGIN_AUTH |
      (if (database.isDefined) CLIENT_CONNECT_WITH_DB else 0L)
    val w = new Packets.Writer
    w.u32(caps)
    w.u32(16 * 1024 * 1024) // max packet
    w.u8(33) // utf8_general_ci
    w.zeros(23)
    w.nulStr(user)
    val scramble = nativePasswordScramble(password, nonce)
    w.u8(scramble.length); w.raw(scramble) // length-prefixed auth response
    database.foreach(w.nulStr)
    w.nulStr("mysql_native_password")
    w.result
  }

  final case class Ok(affectedRows: Long, lastInsertId: Long, status: Int, warnings: Int)
  final case class Err(code: Int, sqlState: String, message: String)

  /** Classify a response packet: OK (0x00), ERR (0xff), EOF (0xfe short). */
  def parseOkErr(payload: Array[Byte]): Either[Err, Ok] = {
    val r = new Packets.Reader(payload)
    r.u8() match {
      case 0x00 | 0xfe =>
        if (payload.length < 7 && (payload(0) & 0xff) == 0xfe)
          Right(Ok(0, 0, if (payload.length >= 5) payload(3) & 0xff else 0, 0)) // EOF
        else {
          val affected = r.lenenc(); val insertId = r.lenenc()
          val status = r.u16(); val warnings = r.u16()
          Right(Ok(affected, insertId, status, warnings))
        }
      case 0xff =>
        val code = r.u16()
        val next = r.buf(r.pos) & 0xff
        val state = if (next == '#') { r.skip(1); new String(r.bytes(5), UTF_8) } else ""
        Left(Err(code, state, r.restString()))
      case other =>
        throw new IllegalStateException(f"not an OK/ERR/EOF packet: first byte 0x$other%02x")
    }
  }
}
