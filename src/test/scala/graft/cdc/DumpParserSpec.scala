package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** S4/X2/X3 dump-parser semantics (ported scenarios from the reference's
  * dump tests: multi-db dumps, rows containing backslashes and quoted
  * quotes) plus the T7 park/repair loop. */
class DumpParserSpec extends AnyFunSuite {

  private val dump = Seq(
    "-- MySQL dump 10.13",
    "",
    // real dumps emit ';'-terminated SET lines before the coordinates —
    // they flush the accumulated comment prefix (same as the reference's
    // accumulate-until-';' loop)
    "SET NAMES utf8;",
    "CHANGE MASTER TO MASTER_LOG_FILE='mysql-bin.000002', MASTER_LOG_POS=1234;",
    "SET @@GLOBAL.GTID_PURGED='de278ad0-2106-11e4-9f8e-6edd0ca20947:1-5';",
    "USE `test1`;",
    "CREATE TABLE `t1` (",
    "  `id` int(11) NOT NULL,",
    "  `name` varchar(100) DEFAULT NULL,",
    "  PRIMARY KEY (`id`)",
    ") ENGINE=InnoDB AUTO_INCREMENT=4 DEFAULT CHARSET=utf8mb4;",
    "INSERT INTO `t1` VALUES (1,'a');",
    "INSERT INTO `t1` VALUES (3,'a\\nb,c',NULL);",
    "USE `test2`;",
    "CREATE TABLE `t2` (`id` int(11) NOT NULL);",
    "INSERT INTO `t2` VALUES (4,'it\\'s');",
  )

  test("parse: coordinates once, db tracking, multi-line DDL, rows") {
    val ddls = mutable.Buffer.empty[(String, String)]
    val rows = mutable.Buffer.empty[(String, String, Vector[String])]
    var gotBinlog: Option[(String, Long)] = None
    var gotGtid: Option[String] = None
    DumpParser.parse(dump.iterator, new DumpParser.Handler {
      override def binlog(name: String, pos: Long): Unit = gotBinlog = Some((name, pos))
      override def gtid(g: String): Unit = gotGtid = Some(g)
      override def ddl(db: String, s: String): Unit = ddls += ((db, s))
      override def data(db: String, t: String, vs: Vector[String]): Unit = rows += ((db, t, vs))
    })
    assert(gotBinlog.contains(("mysql-bin.000002", 1234L)))
    assert(gotGtid.contains("de278ad0-2106-11e4-9f8e-6edd0ca20947:1-5"))
    assert(ddls.map(_._1) == Seq("test1", "test2"))
    assert(ddls.head._2.contains("PRIMARY KEY (`id`)")) // multi-line accumulation
    assert(rows.map(x => (x._1, x._2)) == Seq(("test1", "t1"), ("test1", "t1"), ("test2", "t2")))
    // tokenizer keeps quotes on strings, splits only on un-quoted commas,
    // resolves backslash escapes (quoted newline, comma inside quotes)
    assert(rows(0)._3 == Vector("1", "'a'"))
    assert(rows(1)._3 == Vector("3", "'a\nb,c'", "NULL"))
    assert(rows(2)._3 == Vector("4", "'it's'"))
  }

  test("parseValues: quoted commas, escapes, NULL, unterminated error") {
    assert(DumpParser.parseValues("1,2,3") == Vector("1", "2", "3"))
    assert(DumpParser.parseValues("'x,y',NULL") == Vector("'x,y'", "NULL"))
    assert(DumpParser.parseValues("""'a\'b',7""") == Vector("'a'b'", "7"))
    assert(DumpParser.parseValues("""'\\'""") == Vector("'\\'"))
    intercept[IllegalArgumentException](DumpParser.parseValues("'oops"))
  }

  test("unescape: MySQL control escapes and identity escapes") {
    assert(DumpParser.unescape("""a\nb""") == "a\nb")
    assert(DumpParser.unescape("""a\0b""") == "a\u0000b")
    assert(DumpParser.unescape("""a\Zb""") == "a\u001ab")
    assert(DumpParser.unescape("""a\tb\rc""") == "a\tb\rc")
    assert(DumpParser.unescape("""q\'q \" \\""") == "q'q \" \\")
    assert(DumpParser.unescape("""trail\""") == "trail") // lone trailing backslash dropped
  }

  test("bootstrap: tracker gets the schema, Progress gets the coordinates") {
    val tracker = new SchemaTracker
    tracker.createDatabase("test1")
    tracker.createDatabase("test2")
    val prog = DumpParser.bootstrap(dump.iterator, tracker, serverId = 7L)
    assert(prog.pos == Position("mysql-bin.000002", 1234L, 7L))
    assert(prog.gset.exists(_.toString.startsWith("de278ad0")))
    assert(tracker.getTableDef("test1", "t1").exists(_.columns.map(_.name) == Vector("id", "name")))
    assert(tracker.getTableDef("test2", "t2").isDefined)
  }

  test("DdlGate: failure parks, exec repairs, retry/skip unpark (T7)") {
    val gate = new DdlGate(new SchemaTracker)
    assert(gate.apply("CREATE DATABASE d1", ""))
    assert(!gate.isParked)
    // ALTER on a missing table fails and parks
    assert(!gate.apply("ALTER TABLE d1.missing ADD c INT", ""))
    assert(gate.isParked)
    assert(gate.failed.exists(_.error.contains("missing")))
    // retry without repair fails again
    assert(!gate.retry() && gate.isParked)
    // operator repairs (creates the table), then retry succeeds
    assert(gate.exec("CREATE TABLE d1.missing (id INT)", "").isRight)
    assert(gate.retry() && !gate.isParked)
    assert(gate.tracker.getTableDef("d1", "missing").exists(_.columns.map(_.name) == Vector("id", "c")))
    // skip clears a park without applying
    assert(!gate.apply("ALTER TABLE d1.nope ADD c INT", ""))
    // while parked, replaying a DIFFERENT statement is refused loudly —
    // silently continuing would discard the park and drift the schema
    intercept[IllegalStateException] {
      gate.apply("CREATE TABLE d1.other (id INT)", "")
    }
    assert(gate.isParked)
    // replaying the SAME parked statement is a retry and is allowed
    assert(!gate.apply("ALTER TABLE d1.nope ADD c INT", ""))
    gate.skip()
    assert(!gate.isParked)
  }
}
