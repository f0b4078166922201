package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Ports the reference's progress tests
  * (/root/reference/canal/prog/progress_test.go:23-145) plus seeded
  * property-style tests for the ordering laws and GtidSet algebra. */
class ProgressSpec extends AnyFunSuite {

  test("equal positions compare 0 (TestEqual)") {
    val p1 = Progress("mysql-bin.000002", 1001, 0)
    val p2 = Progress("mysql-bin.000002", 1001, 0)
    assert(p1.compare(p2) == 0)
  }

  test("less/greater by offset (TestLessThan/TestLargeThan)") {
    val p1 = Progress("mysql-bin.000002", 1000, 0)
    val p2 = Progress("mysql-bin.000002", 1001, 0)
    assert(p1.compare(p2) == -1)
    assert(p2.compare(p1) == 1)
  }

  test("binlog file name compared before offset") {
    val p1 = Progress("mysql-bin.000002", 9999, 0)
    val p2 = Progress("mysql-bin.000003", 4, 0)
    assert(p1.compare(p2) == -1)
  }

  test("zero semantics (TestZero)") {
    assert(Progress.zero.isZero)
    assert(!Progress("mysql-bin.000002", 1001, 0).isZero)
    val withGtid = Progress(Position("mysql-bin.000002", 1001, 0),
      Some(GtidSet.parse("cb477437-aacb-11e8-90e7-0242ac110002:1-10")))
    assert(!withGtid.isZero)
    // non-nil but EMPTY gtid set means zero even with file&pos set
    val emptyGtid = Progress(Position("mysql-bin.000002", 1001, 0), Some(GtidSet.empty))
    assert(emptyGtid.isZero)
  }

  test("zero sorts below everything") {
    val p = Progress("mysql-bin.000001", 4, 1)
    assert(Progress.zero.compare(p) == -1)
    assert(p.compare(Progress.zero) == 1)
    assert(Progress.zero.compare(Progress.zero) == 0)
  }

  test("cross-server_id comparison throws (reference panics)") {
    val p1 = Progress(Position("a", 1, 1), None)
    val p2 = Progress(Position("a", 1, 2), None)
    assertThrows[IllegalArgumentException](p1.compare(p2))
    assert(p1.pos.tryCompare(p2.pos).isEmpty)
  }

  test("gtid set parse/format round-trip") {
    val s = "cb477437-aacb-11e8-90e7-0242ac110002:1-10"
    assert(GtidSet.parse(s).toString == s)
    assert(GtidSet.parse("").isEmpty)
    val multi = GtidSet.parse("bbbb:5,aaaa:1-3:7")
    assert(multi.toString == "aaaa:1-3:7,bbbb:5")
  }

  test("gtid set union merges adjacent and overlapping intervals") {
    val a = GtidSet.parse("u:1-5")
    val b = GtidSet.parse("u:6-10")
    assert(a.union(b).toString == "u:1-10")
    val c = GtidSet.parse("u:3-7,v:1")
    assert(a.union(c).toString == "u:1-7,v:1")
  }

  test("gtid set containment") {
    val big = GtidSet.parse("u:1-10,v:1-5")
    assert(big.contains(GtidSet.parse("u:2-9")))
    assert(big.contains(GtidSet.parse("u:1-10,v:5")))
    assert(!big.contains(GtidSet.parse("u:11")))
    assert(!big.contains(GtidSet.parse("w:1")))
    assert(big.contains(GtidSet.empty))
  }

  private def randPos(r: Random): Position = {
    val names = Seq("mysql-bin.000001", "mysql-bin.000002", "mysql-bin.000010")
    Position(names(r.nextInt(names.length)), 4L + r.nextLong(1L << 32), 7)
  }

  test("mariadb gtid: parse/format, per-domain union, containment") {
    val a = GtidSet.Mariadb.parse("0-1-100,1-2-5")
    assert(a.toString == "0-1-100,1-2-5")
    assert(GtidSet.Mariadb.parse("").isEmpty)
    // union takes the per-domain max seq
    val b = GtidSet.Mariadb.parse("0-3-150,2-1-7")
    assert(a.union(b).toString == "0-3-150,1-2-5,2-1-7")
    // containment: per-domain seq >=
    assert(a.contains(GtidSet.Mariadb.parse("0-1-50")))
    assert(!a.contains(GtidSet.Mariadb.parse("0-1-200")))
    assert(!a.contains(GtidSet.Mariadb.parse("2-1-1"))) // unknown domain
    // add keeps the max
    assert(a.add(0, 9, 50).domains(0L) == ((1L, 100L)))
    assert(a.add(0, 9, 200).domains(0L) == ((9L, 200L)))
  }

  test("Gset.parse auto-detects flavor and round-trips both formats") {
    // MySQL fragments always carry ':'; MariaDB ones never do
    val my = Gset.parse("01020304-0506-0708-090a-0b0c0d0e0f10:1-42")
    assert(my.isInstanceOf[GtidSet])
    assert(Gset.parse(my.toString) == my)
    val ma = Gset.parse("0-1-100,1-2-5")
    assert(ma.isInstanceOf[GtidSet.Mariadb])
    assert(Gset.parse(ma.toString) == ma)
    assert(Gset.parse("") == GtidSet.empty)
    // Progress round-trip through its string form stays flavor-faithful
    assert(Progress(Position("f", 1, 7), Some(ma)).toString == "0-1-100,1-2-5")
  }

  test("property: position ordering is a total order within a server_id") {
    val r = new Random(42)
    (1 to 500).foreach { _ =>
      val (a, b, c) = (randPos(r), randPos(r), randPos(r))
      assert(a.compare(b) == -b.compare(a))
      if (a.compare(b) <= 0 && b.compare(c) <= 0) assert(a.compare(c) <= 0)
      assert(a.compare(a) == 0)
    }
  }

  private def randGtidSet(r: Random): GtidSet = {
    val uuids = Seq("u", "v", "w")
    GtidSet(uuids.take(1 + r.nextInt(3)).map { u =>
      u -> GtidSet.normalize(
        Vector.fill(1 + r.nextInt(6))(1L + r.nextInt(40)).map(g => (g, g)))
    }.toMap)
  }

  test("property: union is commutative/idempotent; union contains both inputs") {
    val r = new Random(7)
    (1 to 500).foreach { _ =>
      val (a, b) = (randGtidSet(r), randGtidSet(r))
      assert(a.union(b).toString == b.union(a).toString)
      assert(a.union(a).toString == a.toString)
      assert(a.union(b).contains(a))
      assert(a.union(b).contains(b))
    }
  }
}
