package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

/** The mysqldump child-process bootstrap: argument vector golden against
  * dump.go:146-214, the table-scoped preamble, and the real process
  * plumbing (streamed stdout → DumpParser → tracker; stderr tail on the
  * error; non-zero exit fails even after a clean parse) driven through
  * stub executables — no MySQL in this environment, so the stub emits a
  * canned mysqldump text; the child-process mechanics are the real thing. */
class MysqldumpDumperSpec extends AnyFunSuite {

  private def script(body: String): Path = {
    val p = Files.createTempFile("mysqldump-stub", ".sh",
      PosixFilePermissions.asFileAttribute(PosixFilePermissions.fromString("rwx------")))
    Files.write(p, s"#!/bin/sh\n$body\n".getBytes("UTF-8"))
    p
  }

  /** The canned dump text lives in a FILE the stub `cat`s — it contains
    * single quotes, which an inline printf '...' would mangle. */
  private val dumpFile: Path = {
    val p = Files.createTempFile("mysqldump-stub", ".sql")
    Files.write(p, Seq(
      "CHANGE MASTER TO MASTER_LOG_FILE='mysql-bin.000007', MASTER_LOG_POS=4321;",
      "SET @@GLOBAL.GTID_PURGED='de278ad0-2106-11e4-9f8e-6edd0ca20947:1-9';",
      "USE `shop`;",
      "CREATE TABLE `orders` (`id` int(11) NOT NULL, `note` varchar(64), PRIMARY KEY (`id`));",
    ).mkString("", "\n", "\n").getBytes("UTF-8"))
    p
  }

  test("argument vector matches the reference construction (golden)") {
    val c = MysqldumpDumper.Config(
      addr = "db.example:3307", user = "repl", password = "pw",
      databases = Seq("shop", "crm"), charset = "utf8mb4",
      ignoreTables = Seq(("shop", "tmp1"), ("crm", "scratch")),
      where = "id > 5", maxAllowedPacketMb = 16, hexBlob = true)
    assert(MysqldumpDumper.args(c) === Vector(
      "--host=db.example", "--port=3307", "--user=repl", "--password=pw",
      "--master-data", "--no-data", "--max-allowed-packet=16M",
      "--single-transaction", "--skip-lock-tables", "--compact", "--skip-opt",
      "--quick", "--skip-extended-insert", "--hex-blob",
      "--ignore-table=shop.tmp1", "--ignore-table=crm.scratch",
      "--default-character-set=utf8mb4", "--where=id > 5",
      "--databases", "shop", "crm"))
    // all-databases fallback + skip-master-data
    val c2 = MysqldumpDumper.Config(addr = "localhost", skipMasterData = true)
    val a2 = MysqldumpDumper.args(c2)
    assert(a2.contains("--all-databases") && !a2.contains("--master-data")
      && !a2.exists(_.startsWith("--port")))
    // table-scoped mode: db then tables, plus the preamble
    val c3 = MysqldumpDumper.Config(tableDb = "shop", tables = Seq("orders", "users"))
    assert(MysqldumpDumper.args(c3).takeRight(3) === Vector("shop", "orders", "users"))
    assert(MysqldumpDumper.preamble(c3) === Seq(
      "CREATE DATABASE IF NOT EXISTS `shop`;", "USE `shop`;"))
    assert(MysqldumpDumper.preamble(c2).isEmpty)
  }

  test("streams child stdout into the tracker and returns the resume Progress") {
    val stub = script(s"cat $dumpFile")
    val tracker = new SchemaTracker
    val prog = MysqldumpDumper.dumpAndBootstrap(
      MysqldumpDumper.Config(executionPath = stub.toString, databases = Seq("shop")),
      tracker, serverId = 3L)
    assert(prog.pos == Position("mysql-bin.000007", 4321L, 3L))
    assert(prog.gset.exists(_.toString.contains("de278ad0-2106-11e4-9f8e-6edd0ca20947:1-9")))
    val t = tracker.getTableDef("shop", "orders")
    assert(t.exists(_.columns.map(_.name) == Vector("id", "note")))
  }

  test("table-scoped preamble reaches the parser (db context for the DDL)") {
    // stub emits the CREATE without any USE — only the preamble names the db
    val stub = script(
      """printf 'CREATE TABLE `orders` (`id` int(11) NOT NULL);\n'""")
    val tracker = new SchemaTracker
    MysqldumpDumper.dumpAndBootstrap(
      MysqldumpDumper.Config(executionPath = stub.toString,
        tableDb = "shop", tables = Seq("orders")), tracker)
    assert(tracker.getTableDef("shop", "orders").isDefined)
  }

  test("non-zero exit fails the bootstrap with the stderr tail, even after a clean parse") {
    val stub = script(
      s"""cat $dumpFile
         |echo 'mysqldump: Got error: 1045: Access denied' >&2
         |exit 2""".stripMargin)
    val e = intercept[MysqldumpDumper.MysqldumpException] {
      MysqldumpDumper.dumpAndBootstrap(
        MysqldumpDumper.Config(executionPath = stub.toString, databases = Seq("shop")),
        new SchemaTracker)
    }
    assert(e.getMessage.contains("exited 2"))
    assert(e.getMessage.contains("Access denied"))
  }

  test("missing executable fails cleanly") {
    val e = intercept[MysqldumpDumper.MysqldumpException] {
      MysqldumpDumper.dumpAndBootstrap(
        MysqldumpDumper.Config(executionPath = "/nonexistent/mysqldump"),
        new SchemaTracker)
    }
    assert(e.getMessage.contains("cannot exec"))
  }
}
