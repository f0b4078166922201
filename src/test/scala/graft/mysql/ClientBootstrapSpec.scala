package graft.mysql

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** S3 over a scripted conversation: consistent-snapshot bootstrap reads the
  * master position inside the snapshot, mirrors schema via SHOW CREATE
  * TABLE, chunks SELECT * into insert operations, and returns the resume
  * Progress — the same output contract as DumpParser.bootstrap
  * (reference: dump/dump.go:145-243 + the --master-data line). */
class ClientBootstrapSpec extends AnyFunSuite {

  import MysqlScript._

  /** Text resultset frames for one COM_QUERY (server side, seq from 1). */
  private def resultSet(cols: Seq[String], rows: Seq[Seq[Option[String]]]): Seq[Array[Byte]] = {
    var seq = 0
    def f(p: Array[Byte]): Array[Byte] = { seq += 1; frame(seq, p) }
    Seq(f(new Packets.Writer().lenenc(cols.size.toLong).result)) ++
      cols.map(c => f(colDef(c))) ++
      Seq(f(eofPacket)) ++
      rows.map(r => f(textRow(r: _*))) ++
      Seq(f(eofPacket))
  }

  private def okReply: Seq[Array[Byte]] = Seq(frame(1, okPacket))

  test("bootstrap: snapshot, master position, schema mirror, chunked inserts") {
    val conv: Seq[Array[Byte]] =
      Seq(frame(0, greeting), frame(2, okPacket)) ++ // connect
        okReply ++ // FLUSH TABLES WITH READ LOCK
        okReply ++ // SET ISOLATION
        okReply ++ // START TRANSACTION
        resultSet(Seq("File", "Position", "Binlog_Do_DB"),
          Seq(Seq(Some("mysql-bin.000042"), Some("1234"), Some("")))) ++
        okReply ++ // UNLOCK TABLES
        resultSet(Seq("@@server_id"), Seq(Seq(Some("66693")))) ++
        resultSet(Seq("Database"),
          Seq(Seq(Some("mysql")), Seq(Some("shop")))) ++ // system db filtered
        resultSet(Seq("Tables_in_shop"), Seq(Seq(Some("orders")))) ++
        resultSet(Seq("Table", "Create Table"),
          Seq(Seq(Some("orders"), Some("CREATE TABLE orders (id INT, name VARCHAR(100))")))) ++
        resultSet(Seq("id", "name"), Seq(
          Seq(Some("1"), Some("ada")),
          Seq(Some("2"), None),
          Seq(Some("3"), Some("grace")))) ++
        okReply // COMMIT

    val (in, out) = script(conv: _*)
    val client = new BinlogClient(in, out, "repl", "secret")
    client.connect()
    val tracker = new SchemaTracker
    val boot = new ClientBootstrap(client, tracker, rowsPerOp = 2).run()

    // resume position read under the read lock == the snapshot point,
    // carrying the master's real server_id
    assert(boot.resume.pos == Position("mysql-bin.000042", 1234L, 66693L))
    assert(boot.ops.forall(_.header.serverId == 66693L))

    // schema mirrored
    assert(tracker.getDatabases == Vector("shop"))
    assert(tracker.getTableDef("shop", "orders").get.columns.map(_.name) ==
      Vector("id", "name"))

    // 3 rows chunked at 2 per op -> 2 insert operations
    assert(boot.ops.map(_.opType) == Vector(OpType.Insert, OpType.Insert))
    assert(boot.ops(0).rows == Vector(
      OpRow(None, Some(Vector(Some("1"), Some("ada")))),
      OpRow(None, Some(Vector(Some("2"), None)))))
    assert(boot.ops(1).rows == Vector(
      OpRow(None, Some(Vector(Some("3"), Some("grace"))))))
    assert(boot.ops.forall(_.table.get.name == "orders"))

    // the conversation ran the documented statement order
    val sent = new String(out.toByteArray, UTF_8)
    val order = Seq("FLUSH TABLES WITH READ LOCK", "REPEATABLE READ",
      "CONSISTENT SNAPSHOT", "SHOW MASTER STATUS", "UNLOCK TABLES",
      "SELECT @@server_id",
      "SHOW DATABASES", "SHOW TABLES FROM `shop`", "SHOW CREATE TABLE `shop`.`orders`",
      "SELECT * FROM `shop`.`orders`", "COMMIT")
    val idxs = order.map(sent.indexOf)
    assert(idxs.forall(_ >= 0), s"missing statements: ${order.zip(idxs).filter(_._2 < 0)}")
    assert(idxs == idxs.sorted, "statements out of order")
  }
}
