package graft.mysql

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** Column-value decode matrix for the live source (round-3: the types that
  * previously threw — JSON/BIT/TIME2/classic temporals/ENUM/SET/GEOMETRY).
  * Every byte layout below is hand-built from the PUBLIC binlog/JSONB format
  * docs (dev.mysql.com "Binlog Event" + mysql-server sql/json_binary.h,
  * my_time.cc), so the spec pins the wire layout, not self-consistency.
  * Reference behavior anchor: /root/reference/canal/rows.go:35-91. */
class BinlogValuesSpec extends AnyFunSuite {

  private def dec(colType: Int, meta: Int, bytes: Int*): String =
    BinlogEvents.readValue(colType, meta, new Packets.Reader(bytes.map(_.toByte).toArray))

  // ---------- BIT ----------

  test("BIT(10): big-endian bytes, bit count from split meta") {
    // meta hi = bits%8 = 2, lo = bits/8 = 1; value 716 = 0b10_1100_1100
    assert(dec(16, (2 << 8) | 1, 0x02, 0xcc) == "716")
  }

  test("BIT(64): full-width value renders unsigned") {
    val all = Seq.fill(8)(0xff)
    assert(dec(16, (0 << 8) | 8, all: _*) == "18446744073709551615")
  }

  // ---------- ENUM / SET via STRING packed meta ----------

  test("ENUM 1-byte index (via STRING real-type nibble)") {
    assert(dec(254, (247 << 8) | 1, 0x03) == "3")
  }

  test("ENUM 2-byte index (>255 elements) reads little-endian u16") {
    assert(dec(254, (247 << 8) | 2, 0x01, 0x04) == "1025")
  }

  test("SET bitmask: little-endian across meta-length bytes") {
    assert(dec(254, (248 << 8) | 2, 0x05, 0x01) == "261")
  }

  test("plain CHAR still decodes through the packed-meta path") {
    assert(dec(254, (254 << 8) | 40, 0x02, 'h'.toInt, 'i'.toInt) == "hi")
  }

  // ---------- classic temporals ----------

  test("classic TIME: packed decimal hhmmss") {
    // 134530 = 0x20D82 little-endian
    assert(dec(11, 0, 0x82, 0x0d, 0x02) == "13:45:30")
  }

  test("classic TIME negative: signed int24 sign-extends to '-hh:mm:ss'") {
    // -134530: stored as the signed int24 two's complement of 134530
    val v = (-134530) & 0xffffff
    assert(dec(11, 0, v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff) == "-13:45:30")
  }

  test("classic DATETIME: u64 YYYYMMDDHHMMSS") {
    val v = 20240131123456L
    val bytes = (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toInt)
    assert(dec(12, 0, bytes: _*) == "2024-01-31 12:34:56")
  }

  test("classic TIMESTAMP: epoch seconds (TIMESTAMP2 parity)") {
    val v = 1700000000L
    val bytes = (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toInt)
    assert(dec(7, 0, bytes: _*) == "1700000000")
  }

  // ---------- TIME2 ----------

  test("TIME2 fsp=0: offset-binary big-endian") {
    // 13:45:30 -> intpart (13<<12)|(45<<6)|30 = 56158; + 0x800000 = 0x80DB5E
    assert(dec(19, 0, 0x80, 0xdb, 0x5e) == "13:45:30")
  }

  test("TIME2 fsp=2 negative: fraction borrow (my_time.cc layout)") {
    // -00:00:01.50: packed nr = -(1<<24 | 500000); stored int3 = 0x800000 + (nr>>24)
    // = 0x7FFFFE, frac byte = (char)(nr % 2^24 / 10000) = -50 = 0xCE
    assert(dec(19, 2, 0x7f, 0xff, 0xfe, 0xce) == "-00:00:01.50")
  }

  test("TIME2 fsp=6: single 6-byte offset-binary field") {
    // 01:02:03.000042: intpart (1<<12)|(2<<6)|3 = 4227; nr = 4227<<24 | 42
    val nr = (4227L << 24) | 42L
    val stored = nr + 0x800000000000L
    val bytes = (5 to 0 by -1).map(i => ((stored >> (8 * i)) & 0xff).toInt)
    assert(dec(19, 6, bytes: _*) == "01:02:03.000042")
  }

  // ---------- GEOMETRY ----------

  test("GEOMETRY: blob-framed, hex rendered") {
    // meta=4 (length bytes), payload length 3 LE32, bytes 0x01 0xAB 0x00
    assert(dec(255, 4, 3, 0, 0, 0, 0x01, 0xab, 0x00) == "01ab00")
  }

  // ---------- binary JSON ----------

  private def jsonOf(body: Int*): String = JsonBinary.decode(body.map(_.toByte).toArray)

  test("JSON scalars: literals, ints, double, string") {
    assert(jsonOf(0x04, 0x00) == "null")
    assert(jsonOf(0x04, 0x01) == "true")
    assert(jsonOf(0x04, 0x02) == "false")
    assert(jsonOf(0x05, 0xfe, 0xff) == "-2") // int16
    assert(jsonOf(0x06, 0xfe, 0xff) == "65534") // uint16
    assert(jsonOf(0x07, 0x00, 0x00, 0x01, 0x00) == "65536") // int32
    assert(jsonOf(0x09, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff) == "-1") // int64
    // double 3.5 = 0x400C000000000000 LE
    assert(jsonOf(0x0b, 0, 0, 0, 0, 0, 0, 0x0c, 0x40) == "3.5")
    assert(jsonOf(0x0c, 0x02, 'h'.toInt, 'i'.toInt) == "\"hi\"")
  }

  test("JSON empty payload is SQL null") {
    assert(JsonBinary.decode(Array.emptyByteArray) == "null")
  }

  test("JSON small object with inlined int16 and offset string") {
    // {"a":1,"b":"x"} — header: count=2, size=22; key entries (off,len);
    // value entries: inline int16, string at offset 20
    val b = Seq(
      0x00, // small object
      0x02, 0x00, 0x16, 0x00, // count=2, size=22
      0x12, 0x00, 0x01, 0x00, // key "a" @18 len 1
      0x13, 0x00, 0x01, 0x00, // key "b" @19 len 1
      0x05, 0x01, 0x00, // value 1 inline int16
      0x0c, 0x14, 0x00, // value string @20
      'a'.toInt, 'b'.toInt,
      0x01, 'x'.toInt)
    assert(jsonOf(b: _*) == "{\"a\":1,\"b\":\"x\"}")
  }

  test("JSON small array with mixed inline/offset values") {
    // [true,null,300,"hi",3.5] — header 2+2, 5 entries of 3 bytes
    val b = Seq(
      0x02, // small array
      0x05, 0x00, 0x1e, 0x00, // count=5, size=30
      0x04, 0x01, 0x00, // true inline
      0x04, 0x00, 0x00, // null inline
      0x05, 0x2c, 0x01, // 300 inline int16
      0x0c, 0x13, 0x00, // string @19
      0x0b, 0x16, 0x00, // double @22
      0x02, 'h'.toInt, 'i'.toInt,
      0, 0, 0, 0, 0, 0, 0x0c, 0x40) // 3.5 LE
    assert(jsonOf(b: _*) == "[true,null,300,\"hi\",3.5]")
  }

  test("JSON nested container: array value inside object resolves via offset") {
    // {"a":[1,2]}
    val b = Seq(
      0x00,
      0x01, 0x00, 0x16, 0x00, // count=1, size=22
      0x0b, 0x00, 0x01, 0x00, // key "a" @11 len 1
      0x02, 0x0c, 0x00, // value small array @12
      'a'.toInt,
      // array body @12: count=2, size=10, two inline int16
      0x02, 0x00, 0x0a, 0x00,
      0x05, 0x01, 0x00,
      0x05, 0x02, 0x00)
    assert(jsonOf(b: _*) == "{\"a\":[1,2]}")
  }

  test("JSON large array inlines int32 in 4-byte slots") {
    // [65536] large format: 4-byte count/size, entry = type + 4 inline bytes
    val b = Seq(
      0x03,
      0x01, 0x00, 0x00, 0x00, 0x0d, 0x00, 0x00, 0x00, // count=1, size=13
      0x07, 0x00, 0x00, 0x01, 0x00) // int32 65536 inline
    assert(jsonOf(b: _*) == "[65536]")
  }

  test("JSON opaque NEWDECIMAL decodes to its numeric string") {
    // 123.45 as decimal(5,2): int leftover 3 digits = 2 bytes (0x80 | 0x00, 0x7B), frac 1 byte 45
    val b = Seq(
      0x0f, // opaque
      246, // inner field type NEWDECIMAL
      0x05, // varlen payload length 5
      0x05, 0x02, // precision 5, scale 2
      0x80, 0x7b, 0x2d)
    assert(jsonOf(b: _*) == "123.45")
  }

  test("JSON string escaping") {
    val raw = "a\"b\\c\nd"
    val bytes = raw.getBytes(UTF_8)
    val b = Seq(0x0c, bytes.length) ++ bytes.map(_.toInt & 0xff)
    assert(jsonOf(b: _*) == "\"a\\\"b\\\\c\\nd\"")
  }

  // ---------- TABLE_MAP meta widths + rows integration ----------

  test("rows event with the new types decodes end-to-end against TABLE_MAP") {
    import BinlogEvents._
    // table: (b BIT(10), j JSON, e ENUM small, s SET(2 bytes), t2 TIME2(0),
    //         dt DATETIME classic, g GEOMETRY)
    val tableMapPayload = {
      val w = new Packets.Writer
      w.raw(Array[Byte](7, 0, 0, 0, 0, 0)); w.u16(1)
      w.u8(4); w.eofStr("shop"); w.u8(0)
      w.u8(5); w.eofStr("typed"); w.u8(0)
      w.lenenc(7L)
      w.u8(16); w.u8(245); w.u8(254); w.u8(254); w.u8(19); w.u8(12); w.u8(255)
      val meta = new Packets.Writer
      meta.u8(2); meta.u8(1) // BIT: bits%8=2, bits/8=1
      meta.u8(4) // JSON: 4 length bytes
      meta.u8(247); meta.u8(1) // STRING packed: real type ENUM, 1 byte
      meta.u8(248); meta.u8(2) // STRING packed: real type SET, 2 bytes
      meta.u8(0) // TIME2 fsp 0
      // classic DATETIME: no meta
      meta.u8(4) // GEOMETRY: 4 length bytes
      w.lenencBytes(meta.result)
      w.u8(0x7f) // null bitmap
      w.result
    }
    val rowsPayload = {
      val w = new Packets.Writer
      w.raw(Array[Byte](7, 0, 0, 0, 0, 0)); w.u16(1)
      w.u16(2) // v2 extra len
      w.lenenc(7L)
      w.u8(0x7f) // all 7 present
      w.u8(0x00) // none null
      w.u8(0x02); w.u8(0xcc) // BIT 716 BE
      // JSON {"a":[1,2]}: length 23 LE32 then body
      val jsonBody = Array[Int](
        0x00, 0x01, 0x00, 0x16, 0x00, 0x0b, 0x00, 0x01, 0x00,
        0x02, 0x0c, 0x00, 'a'.toInt, 0x02, 0x00, 0x0a, 0x00,
        0x05, 0x01, 0x00, 0x05, 0x02, 0x00).map(_.toByte)
      w.u32(jsonBody.length.toLong); w.raw(jsonBody)
      w.u8(0x02) // ENUM index 2
      w.u8(0x05); w.u8(0x01) // SET bitmask 261
      w.u8(0x80); w.u8(0xdb); w.u8(0x5e) // TIME2 13:45:30
      w.u64(20240131123456L) // classic DATETIME
      w.u32(2); w.u8(0xab); w.u8(0xcd) // GEOMETRY 2 bytes
      w.result
    }
    val tm = parseEvent(
      EventHeader(1, TABLE_MAP_EVENT, 1, 0, 0, 0),
      new Packets.Reader(tableMapPayload), Map.empty).asInstanceOf[TableMap]
    val rows = parseEvent(
      EventHeader(1, WRITE_ROWS_V2, 1, 0, 0, 0),
      new Packets.Reader(rowsPayload), Map(7L -> tm)).asInstanceOf[Rows]
    assert(rows.rows == Vector((None, Some(Vector(
      Some("716"), Some("{\"a\":[1,2]}"), Some("2"), Some("261"),
      Some("13:45:30"), Some("2024-01-31 12:34:56"), Some("abcd"))))))
  }
}
