package graft.mysql

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** Schema snapshots over the MySQL client (storage_mysql.go twin), driven
  * by a scripted wire conversation: snapshot → restore at position. */
class MysqlSnapshotStorageSpec extends AnyFunSuite {

  import MysqlScript._

  private val defs = Vector(
    TableDef("shop", "orders", Vector(
      ColumnDef("id", "int(11)", InnerType.LONG, key = "PRI", nullable = false),
      ColumnDef("name", "varchar(100)", InnerType.VARCHAR, charset = "utf8")),
      "utf8"))
  private val pos = Position("mysql-bin.000042", 1500, 77)
  private val snapHex = SchemaSnapshotCodec.encode(pos, Vector("shop"), defs)
    .map(b => f"${b & 0xff}%02x").mkString

  test("save writes the snapshot as a hex literal through COM_QUERY") {
    val (in, out) = script(
      frame(0, greeting), frame(2, okPacket), // connect
      frame(1, okPacket), // CREATE TABLE
      frame(1, okPacket), // INSERT
      frame(1, okPacket)) // purge DELETE
    val c = new BinlogClient(in, out, "root", "secret")
    c.connect()
    val storage = new MysqlSnapshotStorage(c)
    storage.init()
    storage.save(pos, Vector("shop"), defs)
    val sent = new String(out.toByteArray, UTF_8)
    assert(sent.contains("CREATE TABLE IF NOT EXISTS tb_schema_data"))
    assert(sent.contains("INSERT INTO tb_schema_data SET name='mysql-bin.000042', pos=1500"))
    assert(sent.contains(s"snapshot=x'$snapHex'"))
    assert(sent.contains("DELETE FROM tb_schema_data"))
  }

  private def selectConversation: (java.io.ByteArrayInputStream, java.io.ByteArrayOutputStream) =
    script(
      frame(0, greeting), frame(2, okPacket), // connect
      frame(1, new Packets.Writer().lenenc(1L).result),
      frame(2, colDef("HEX(snapshot)")),
      frame(3, eofPacket),
      frame(4, textRow(Some(snapHex.toUpperCase))), // MySQL HEX() is uppercase
      frame(5, eofPacket))

  test("restore at position decodes the served snapshot back to the catalog") {
    val (in, out) = selectConversation
    val c = new BinlogClient(in, out, "root", "secret")
    c.connect()
    val storage = new MysqlSnapshotStorage(c)
    val (rpos, rdbs, rdefs) = storage.load(Position("mysql-bin.000042", 2000, 77)).get
    assert(rpos == pos)
    assert(rdbs == Vector("shop"))
    assert(rdefs == defs)
    // the restore query constrains to at-or-below the position, same server
    val sent = new String(out.toByteArray, UTF_8)
    assert(sent.contains("server_id=77"))
    assert(sent.contains("(name < 'mysql-bin.000042' OR (name = 'mysql-bin.000042' AND pos <= 2000))"))
  }

  test("loadLast returns the newest snapshot") {
    val (in, _) = selectConversation
    val c = new BinlogClient(in, new java.io.ByteArrayOutputStream(), "root", "secret")
    c.connect()
    val storage = new MysqlSnapshotStorage(c)
    val (rpos, _, rdefs) = storage.loadLast().get
    assert(rpos == pos)
    assert(rdefs.head.columns.map(_.name) == Vector("id", "name"))
  }

  test("an empty resultset restores nothing") {
    val (in, _) = script(
      frame(0, greeting), frame(2, okPacket),
      frame(1, new Packets.Writer().lenenc(1L).result),
      frame(2, colDef("HEX(snapshot)")),
      frame(3, eofPacket),
      frame(4, eofPacket)) // no rows
    val c = new BinlogClient(in, new java.io.ByteArrayOutputStream(), "root", "secret")
    c.connect()
    assert(new MysqlSnapshotStorage(c).loadLast().isEmpty)
  }
}
