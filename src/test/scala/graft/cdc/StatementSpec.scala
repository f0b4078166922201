package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Ports TestTrimStatement (/root/reference/canal/canal_test.go:155-169)
  * and the filter truth table (:136-153). */
class StatementSpec extends AnyFunSuite {

  test("TrimStatement: the reference's five cases normalize identically") {
    val cases = Seq(
      "   drop    table test1",
      "DROP\r\nTABLE test1",
      "--comment \nDROP TABLE test1",
      "#comment \nDROP TABLE test1",
      "/*hint*/ DROP   /*com\nment*/   TABLE \ntest1")
    cases.foreach { c =>
      assert(Statement.trim(c) == "DROP TABLE TEST1", s"case: $c")
    }
  }

  test("isDdlOrDcl prefix classification") {
    assert(Statement.isDdlOrDcl("CREATE TABLE T (A INT)"))
    assert(Statement.isDdlOrDcl("GRANT ALL ON *.* TO X"))
    assert(Statement.isDdlOrDcl("FLUSH PRIVILEGES"))
    assert(!Statement.isDdlOrDcl("INSERT INTO T VALUES (1)"))
    assert(!Statement.isDdlOrDcl("BEGIN"))
    assert(Statement.isDdl("TRUNCATE TABLE T"))
    assert(!Statement.isDdl("GRANT SELECT ON D.T TO U")) // DCL, not DDL
  }

  test("canal filter truth table (F1: include then exclude override)") {
    // TestCanalFilter fixtures: include [.*\.canal_test, test\..*],
    // exclude [mysql\..*, .*\..*_inner]
    val f = CanalTableFilter(
      Seq(".*\\.canal_test", "test\\..*"),
      Seq("mysql\\..*", ".*\\..*_inner"))
    assert(f.matches("test", "canal_test"))
    assert(f.matches("not_exist_db", "canal_test")) // include matches first regex
    assert(!f.matches("test", "canal_test_inner")) // exclude overrides
    assert(!f.matches("mysql", "canal_test")) // exclude overrides include
    assert(!f.matches("not_exist_db", "not_canal_test")) // no include match
    // memoized second call returns the same
    assert(!f.matches("mysql", "canal_test"))
  }

  test("F1: nothing configured includes everything") {
    val f = CanalTableFilter(Nil, Nil)
    assert(f.matches("any", "thing"))
  }

  test("F1: only excludes configured means nothing matches includes") {
    // reference semantics: matchFlag starts false and only include regexes
    // can set it true — exclude-only config excludes EVERYTHING
    val f = CanalTableFilter(Nil, Seq("mysql\\..*"))
    assert(!f.matches("test", "t"))
    assert(!f.matches("mysql", "t"))
  }

  test("sink filter truth table (F2: default-ignored once configured)") {
    val f = SinkTableFilter(Seq("test\\..*"), Seq(".*\\.secret"))
    assert(!f.isIgnored("test", "t1")) // include rescues
    assert(f.isIgnored("other", "t1")) // default ignored
    assert(f.isIgnored("test", "secret")) // exclude re-ignores
    val empty = SinkTableFilter(Nil, Nil)
    assert(!empty.isIgnored("any", "thing")) // both empty: NOT ignored
    val exclOnly = SinkTableFilter(Nil, Seq("mysql\\..*"))
    assert(exclOnly.isIgnored("mysql", "db")) // excluded
    assert(exclOnly.isIgnored("test", "t")) // still default-ignored (no include)
  }

  test("duplicate-event filter (F3): drops at-or-below checkpoint until catch-up") {
    val ckp = Progress("mysql-bin.000008", 602, 66693)
    val f = new DuplicateEventFilter(ckp)
    assert(f.isDuplicated(66693, "mysql-bin.000008", 400)) // below
    assert(f.isDuplicated(66693, "mysql-bin.000008", 602)) // equal
    assert(!f.isDuplicated(66693, "mysql-bin.000008", 700)) // above → catch up
    assert(f.isCaughtUp)
    // once caught up, nothing is duplicated — even lower positions
    assert(!f.isDuplicated(66693, "mysql-bin.000008", 100))
  }

  test("duplicate-event filter: different server_id treated as new event") {
    val f = new DuplicateEventFilter(Progress("mysql-bin.000008", 602, 66693))
    assert(!f.isDuplicated(99999, "mysql-bin.000001", 4))
    assert(f.isCaughtUp)
  }

  test("duplicate-event filter: zero checkpoint passes everything") {
    val f = new DuplicateEventFilter(Progress.zero)
    assert(!f.isDuplicated(1, "mysql-bin.000001", 4))
  }
}
