package graft.mysql

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Protocol-level tests for the live-source client, driven by scripted
  * server conversations built byte-by-byte from the PUBLIC protocol docs
  * (handshake v10 / HandshakeResponse41 / text resultset / binlog event
  * layout) — so the spec pins the wire layout, not self-consistency.
  * Reference behavior anchors: /root/reference/canal/canal.go:368-377
  * (ROW-format check), canal/sync.go:84-225 (event switch). */
class BinlogClientSpec extends AnyFunSuite {

  import MysqlScript._

  // ---------- connection phase ----------

  test("handshake: greeting parses; response41 carries the documented scramble") {
    val (in, out) = script(frame(0, greeting), frame(2, okPacket))
    val client = new BinlogClient(in, out, "repl", "secret")
    val hs = client.connect()
    assert(hs.serverVersion == "8.0.99-test")
    assert(hs.threadId == 42)
    assert(hs.authPluginName == "mysql_native_password")
    assert(hs.authPluginData.toSeq == nonce.toSeq)

    // independently computed: SHA1(p) xor SHA1(nonce ++ SHA1(SHA1(p)))
    def sha1(bs: Array[Byte]*) = {
      val md = MessageDigest.getInstance("SHA-1"); bs.foreach(md.update); md.digest()
    }
    val p1 = sha1("secret".getBytes(UTF_8))
    val expected = p1.zip(sha1(nonce, sha1(p1))).map { case (a, b) => (a ^ b).toByte }

    val sent = out.toByteArray
    // response41 is the second... first packet the client writes (seq 1)
    assert(sent(3) == 1) // sequence continues the server's
    val payload = sent.drop(4)
    val r = new Packets.Reader(payload)
    val caps = r.u32()
    assert((caps & Packets.CLIENT_PROTOCOL_41) != 0)
    assert((caps & Packets.CLIENT_PLUGIN_AUTH) != 0)
    r.u32(); r.u8(); r.skip(23)
    assert(r.nulString() == "repl")
    val n = r.u8()
    assert(n == 20)
    assert(r.bytes(n).toSeq == expected.toSeq)
    assert(r.nulString() == "mysql_native_password")
  }

  test("empty password sends an empty auth response") {
    val (in, out) = script(frame(0, greeting), frame(2, okPacket))
    new BinlogClient(in, out, "root", "").connect()
    val r = new Packets.Reader(out.toByteArray.drop(4))
    r.u32(); r.u32(); r.u8(); r.skip(23); r.nulString()
    assert(r.u8() == 0)
  }

  // ---------- COM_QUERY / S2 ----------

  private def variablesConversation(value: String) = script(
    (Seq(frame(0, greeting), frame(2, okPacket)) ++ binlogFormatResult(value)): _*)

  test("S2: ROW-format precondition accepts ROW") {
    val (in, out) = variablesConversation("ROW")
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    assert(c.checkBinlogRowFormat() == Right(()))
  }

  test("S2: ROW-format precondition refuses STATEMENT, like the reference") {
    val (in, out) = variablesConversation("STATEMENT")
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    assert(c.checkBinlogRowFormat() == Left("binlog must be ROW format, but STATEMENT now"))
  }

  private def rowImageConversation(packets: Seq[Array[Byte]]) = script(
    (Seq(frame(0, greeting), frame(2, okPacket)) ++ packets): _*)

  test("S2: row-image precondition accepts FULL (case-insensitively)") {
    for (v <- Seq("FULL", "full")) {
      val (in, out) = rowImageConversation(binlogRowImageResult(v))
      val c = new BinlogClient(in, out, "repl", "secret")
      c.connect()
      assert(c.checkBinlogRowImage() == Right(()))
    }
  }

  test("S2: row-image precondition refuses MINIMAL and NOBLOB, like the reference") {
    for (v <- Seq("MINIMAL", "noblob")) {
      val (in, out) = rowImageConversation(binlogRowImageResult(v))
      val c = new BinlogClient(in, out, "repl", "secret")
      c.connect()
      // a MINIMAL/NOBLOB master streams partial before-images — every
      // downstream UPDATE/DELETE merge would be silently wrong
      assert(c.checkBinlogRowImage() ==
        Left(s"MySQL uses $v binlog row image, but we want FULL"))
    }
  }

  test("S2: a pre-5.6 server without binlog_row_image passes the check") {
    val (in, out) = rowImageConversation(binlogRowImageAbsent)
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    assert(c.checkBinlogRowImage() == Right(()))
  }

  test("T8: heartbeat period is set via SET @master_heartbeat_period") {
    val (in, out) = script(frame(0, greeting), frame(2, okPacket), frame(1, okPacket))
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    c.setHeartbeatPeriod(30.0)
    val sent = new String(out.toByteArray, UTF_8)
    assert(sent.contains("SET @master_heartbeat_period = 30000000000"))
  }

  // ---------- binlog dump stream ----------

  test("dump: FDE announces CRC32; events decode with checksums stripped; " +
      "rows decode against TABLE_MAP; heartbeat keeps the stream alive") {
    import BinlogEvents._

    // table: (id LONG, name VARCHAR(100), big LONGLONG)
    val tableMapPayload = {
      val w = new Packets.Writer
      w.raw(Array[Byte](9, 0, 0, 0, 0, 0)) // table id 9 (u48)
      w.u16(1) // flags
      w.u8(4); w.eofStr("shop"); w.u8(0)
      w.u8(6); w.eofStr("orders"); w.u8(0)
      w.lenenc(3L)
      w.u8(3); w.u8(15); w.u8(8) // LONG, VARCHAR, LONGLONG
      w.lenenc(2L); w.u16(100) // meta block: VARCHAR max len 100
      w.u8(0x07) // null bitmap (all nullable)
      w.result
    }
    val writeRowsPayload = {
      val w = new Packets.Writer
      w.raw(Array[Byte](9, 0, 0, 0, 0, 0)); w.u16(1)
      w.u16(2) // v2 extra data: just its own length
      w.lenenc(3L)
      w.u8(0x07) // columns present: all 3
      // row 1: (7, "ok", 1234567890123)
      w.u8(0x00) // null bitmap
      w.u32(7)
      w.u8(2); w.eofStr("ok")
      w.u64(1234567890123L)
      // row 2: (8, NULL, -5)
      w.u8(0x02) // name is NULL
      w.u32(8)
      w.u64(-5L)
      w.result
    }
    val beginPayload = {
      val w = new Packets.Writer
      w.u32(11); w.u32(0); w.u8(4); w.u16(0); w.u16(0)
      w.eofStr("shop"); w.u8(0); w.eofStr("BEGIN")
      w.result
    }
    val gtidPayload = {
      val w = new Packets.Writer
      w.u8(1)
      w.raw((1 to 16).map(_.toByte).toArray)
      w.u64(99L)
      w.result
    }

    val (in, out) = script(Seq(
      frame(0, greeting), frame(2, okPacket), // connect
      frame(1, okPacket)) ++ // register slave
      checksumAnnounce("CRC32") ++ Seq(
      // dump response
      frame(1, eventPacket(FORMAT_DESCRIPTION_EVENT, 124, fdePayload(alg = 1), crc = true)),
      frame(2, eventPacket(ROTATE_EVENT, 0,
        new Packets.Writer().u64(4L).eofStr("mysql-bin.000042").result, crc = true, timestamp = 0)),
      frame(3, eventPacket(GTID_EVENT, 200, gtidPayload, crc = true)),
      frame(4, eventPacket(QUERY_EVENT, 260, beginPayload, crc = true)),
      frame(5, eventPacket(TABLE_MAP_EVENT, 320, tableMapPayload, crc = true)),
      frame(6, eventPacket(WRITE_ROWS_V2, 400, writeRowsPayload, crc = true)),
      frame(7, eventPacket(HEARTBEAT_EVENT, 400,
        "mysql-bin.000042".getBytes(UTF_8), crc = true)),
      frame(8, eventPacket(XID_EVENT, 440,
        new Packets.Writer().u64(777L).result, crc = true)),
      frame(9, eofPacket)): _*)

    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    c.registerSlave(serverId = 1001)
    val events = c.dump("mysql-bin.000042", 4, serverId = 1001).toVector
    assert(events.size == 8)

    val types = events.map(_._2.getClass.getSimpleName)
    assert(types == Vector("FormatDescription", "Rotate", "Gtid", "Query",
      "TableMap", "Rows", "Heartbeat", "Xid"))

    val fd = events(0)._2.asInstanceOf[FormatDescription]
    assert(fd.checksumAlg == 1)
    assert(fd.serverVersion == "8.0.99-test")

    val rot = events(1)._2.asInstanceOf[Rotate]
    assert(rot.nextLogName == "mysql-bin.000042")
    assert(rot.position == 4)
    assert(events(1)._1.timestamp == 0) // fake rotate (sync.go:93)

    assert(events(2)._2 == Gtid("01020304-0506-0708-090a-0b0c0d0e0f10", 99))

    val rows = events(5)._2.asInstanceOf[Rows]
    assert(rows.kind == "insert")
    assert(rows.rows == Vector(
      (None, Some(Vector(Some("7"), Some("ok"), Some("1234567890123")))),
      (None, Some(Vector(Some("8"), None, Some("-5"))))))

    // ---- and the Operation mapping consumed by the rest of the pipeline ----
    val tracker = new SchemaTracker
    tracker.execDdl("CREATE DATABASE shop", "")
    tracker.execDdl("CREATE TABLE orders (id INT, name VARCHAR(100), big BIGINT)", "shop")
    val mapper = new BinlogToOps(tracker.getTableDef(_, _))
    val tm = events(4)._2.asInstanceOf[TableMap]

    val ops = events.flatMap {
      case (h, r: Rows) => Some(mapper.toRowsOperation(h, r, tm))
      case (h, e) => mapper.toOperation(h, e)
    }
    assert(ops.map(_.opType) == Vector(
      OpType.Rotate, OpType.Gtid, OpType.Begin, OpType.Insert, OpType.Commit))
    val ins = ops(3)
    assert(ins.table.get.name == "orders")
    assert(ins.table.get.columns.map(_.name) == Vector("id", "name", "big"))
    assert(ins.gtid.isEmpty) // consumed by BEGIN
    assert(ops(2).gtid.contains("01020304-0506-0708-090a-0b0c0d0e0f10:99"))

    // the threaded envelope — same downstream path as the replay source
    val envs = graft.streaming.ChangeStream.threadLogNames(ops.iterator).toVector
    assert(envs.forall(_.logName == "mysql-bin.000042"))
  }

  test("dump without FDE checksum does not strip event tails") {
    import BinlogEvents._
    val (in, out) = script(Seq(
      frame(0, greeting), frame(2, okPacket)) ++
      checksumAnnounce("NONE") ++ Seq(
      frame(1, eventPacket(FORMAT_DESCRIPTION_EVENT, 124, fdePayload(alg = 0), crc = false)),
      frame(2, eventPacket(XID_EVENT, 200,
        new Packets.Writer().u64(42L).result, crc = false)),
      frame(3, eofPacket)): _*)
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    val evs = c.dump("mysql-bin.000001", 4, 1001).toVector
    assert(evs.map(_._2).collect { case Xid(x) => x } == Vector(42L))
  }

  test("pre-5.6 server: unknown checksum variable degrades to no-checksum") {
    import BinlogEvents._
    val (in, out) = script(Seq(
      frame(0, greeting), frame(2, okPacket),
      // SET @master_binlog_checksum → ER_UNKNOWN_SYSTEM_VARIABLE: the one
      // failure that means "old server, no checksums" — dump proceeds bare
      frame(1, errPacket(1193, "Unknown system variable 'binlog_checksum'")),
      frame(1, eventPacket(FORMAT_DESCRIPTION_EVENT, 124, fdePayload(alg = 0), crc = false)),
      frame(2, eventPacket(XID_EVENT, 200,
        new Packets.Writer().u64(7L).result, crc = false)),
      frame(3, eofPacket)): _*)
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    val evs = c.dump("mysql-bin.000001", 4, 1001).toVector
    assert(evs.map(_._2).collect { case Xid(x) => x } == Vector(7L))
  }

  test("non-variable ERR during checksum announce propagates, not degrades") {
    val (in, out) = script(
      frame(0, greeting), frame(2, okPacket),
      // a lock timeout is NOT "old server": treating it as no-checksum
      // would leave CRC trailers on every event and parse garbage
      frame(1, errPacket(1205, "Lock wait timeout exceeded")))
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    val e = intercept[BinlogClient.MysqlQueryError] {
      c.dump("mysql-bin.000001", 4, 1001)
    }
    assert(e.code == 1205)
  }

  test("GTID dump: COM_BINLOG_DUMP_GTID carries the documented SID block " +
      "with exclusive interval upper bounds") {
    import BinlogEvents._
    val (in, out) = script(Seq(
      frame(0, greeting), frame(2, okPacket)) ++
      checksumAnnounce("CRC32") ++ Seq(
      frame(1, eventPacket(FORMAT_DESCRIPTION_EVENT, 124, fdePayload(alg = 1), crc = true)),
      frame(2, eventPacket(XID_EVENT, 200,
        new Packets.Writer().u64(7L).result, crc = true)),
      frame(3, eofPacket)): _*)
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    val gset = GtidSet.parse(
      "01020304-0506-0708-090a-0b0c0d0e0f10:1-5:7,aaaabbbb-cccc-dddd-eeee-ffff00001111:3")
    val evs = c.dumpGtid(gset, serverId = 1001).toVector
    assert(evs.map(_._2).collect { case Xid(x) => x } == Vector(7L))

    // the last packet the client wrote is the dump command; walk its layout
    val sent = out.toByteArray
    // skip the handshake response: find the frame whose first payload byte is 0x1e
    var off = 0
    var dump: Array[Byte] = null
    while (off < sent.length) {
      val len = (sent(off) & 0xff) | ((sent(off + 1) & 0xff) << 8) | ((sent(off + 2) & 0xff) << 16)
      val payload = java.util.Arrays.copyOfRange(sent, off + 4, off + 4 + len)
      if ((payload(0) & 0xff) == Packets.COM_BINLOG_DUMP_GTID) dump = payload
      off += 4 + len
    }
    assert(dump != null, "no COM_BINLOG_DUMP_GTID frame written")
    val r = new Packets.Reader(dump)
    assert(r.u8() == Packets.COM_BINLOG_DUMP_GTID)
    assert(r.u16() == Packets.BINLOG_THROUGH_GTID)
    assert(r.u32() == 1001L) // server id
    assert(r.u32() == 0L) // empty filename
    assert(r.u64() == 4L) // start pos
    val dataSize = r.u32()
    assert(dataSize == r.remaining.toLong)
    assert(r.u64() == 2L) // n_sids
    // first SID (sorted): 01020304-...
    assert(r.bytes(16).toSeq == (1 to 16).map(_.toByte).toSeq)
    assert(r.u64() == 2L) // two intervals
    assert((r.u64(), r.u64()) == ((1L, 6L))) // 1-5 inclusive -> [1,6)
    assert((r.u64(), r.u64()) == ((7L, 8L))) // 7 -> [7,8)
    // second SID
    assert(r.bytes(16).map(b => f"${b & 0xff}%02x").mkString ==
      "aaaabbbbccccddddeeeeffff00001111")
    assert(r.u64() == 1L)
    assert((r.u64(), r.u64()) == ((3L, 4L)))
    assert(!r.hasNext)
  }

  test("MariaDB GTID start: slave_connect_state announced, then a plain dump") {
    import BinlogEvents._
    val (in, out) = script(Seq(
      frame(0, greeting), frame(2, okPacket),
      frame(1, okPacket), frame(1, okPacket), frame(1, okPacket), frame(1, okPacket)) ++ // 4 SETs
      checksumAnnounce("CRC32") ++ Seq(
      frame(1, eventPacket(FORMAT_DESCRIPTION_EVENT, 124, fdePayload(alg = 1), crc = true)),
      frame(2, eventPacket(XID_EVENT, 200,
        new Packets.Writer().u64(5L).result, crc = true)),
      frame(3, eofPacket)): _*)
    val c = new BinlogClient(in, out, "repl", "secret")
    c.connect()
    val evs = c.dumpMariadbGtid(GtidSet.Mariadb.parse("0-1-100,1-2-5"), serverId = 1001).toVector
    assert(evs.map(_._2).collect { case Xid(x) => x } == Vector(5L))
    val sent = new String(out.toByteArray, UTF_8)
    assert(sent.contains("SET @mariadb_slave_capability = 4"))
    assert(sent.contains("SET @slave_connect_state = '0-1-100,1-2-5'"))
    assert(sent.contains("SET @slave_gtid_strict_mode = 0"))
    // and the dump command itself is the plain (file, pos) form from ("", 0)
    var off = 0
    var found = false
    val bytes = out.toByteArray
    while (off < bytes.length) {
      val len = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) | ((bytes(off + 2) & 0xff) << 16)
      if ((bytes(off + 4) & 0xff) == Packets.COM_BINLOG_DUMP) {
        val r = new Packets.Reader(java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + len))
        r.u8()
        assert(r.u32() == 0L) // pos 0: the session variables carry the state
        found = true
      }
      off += 4 + len
    }
    assert(found)
  }

  test("NEWDECIMAL decodes sign, integral and fractional groups") {
    // decimal(14,4) value 1234567890.1234:
    // int part 1234567890 -> leftover 1 digit group "1" (1 byte) + word 234567890
    // frac part 1234 -> leftover 4 digits (2 bytes)
    val w = new Packets.Writer
    w.u8(0x81) // leftover int byte for "1", sign bit set (positive)
    // 234567890 big-endian 4 bytes
    w.u8(0x0d); w.u8(0xfb); w.u8(0x38); w.u8(0xd2)
    w.u8(0x04); w.u8(0xd2) // 1234 big-endian 2 bytes
    val r = new Packets.Reader(w.result)
    val dec = BinlogEvents.readValue(246, (14 << 8) | 4, r)
    assert(dec == "1234567890.1234")
  }

  test("NEWDECIMAL with a zero leading group renders without zero-padding") {
    // decimal(12,2) value 1.50: intDigits=10 -> leftover 1 digit group 0
    // (1 byte) + word 1; frac 50 -> leftover 2 digits (1 byte)
    val w = new Packets.Writer
    w.u8(0x80) // leftover int group = 0, sign bit set (positive)
    w.u8(0); w.u8(0); w.u8(0); w.u8(1) // int word 1, big-endian
    w.u8(50) // frac leftover
    val r = new Packets.Reader(w.result)
    assert(BinlogEvents.readValue(246, (12 << 8) | 2, r) == "1.50")

    // and the all-zero integer part keeps a single 0 (value 0.25)
    val w2 = new Packets.Writer
    w2.u8(0x80); w2.u8(0); w2.u8(0); w2.u8(0); w2.u8(0); w2.u8(25)
    val r2 = new Packets.Reader(w2.result)
    assert(BinlogEvents.readValue(246, (12 << 8) | 2, r2) == "0.25")

    // negative 1.50 (decimal(12,2)): stored as bitwise NOT of the positive
    val w3 = new Packets.Writer
    w3.u8(0x80); w3.u8(0); w3.u8(0); w3.u8(0); w3.u8(1); w3.u8(50)
    val bytes = w3.result.map(b => (~b).toByte)
    val r3 = new Packets.Reader(bytes)
    assert(BinlogEvents.readValue(246, (12 << 8) | 2, r3) == "-1.50")
  }
}
