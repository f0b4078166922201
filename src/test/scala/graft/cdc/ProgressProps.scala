package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** SURVEY §5 property tests: Position total-order laws (same server_id),
  * cross-server_id incomparability, and GtidSet algebra. */
object ProgressProps extends Properties("Progress") {

  private val genPos: Gen[Position] = for {
    n <- Gen.chooseNum(1, 999999)
    p <- Gen.chooseNum(0L, 1L << 40)
  } yield Position(f"mysql-bin.$n%06d", p, serverId = 1L)

  private def sign(i: Int): Int = Integer.signum(i)

  property("compare is antisymmetric") = forAll(genPos, genPos) { (a, b) =>
    sign(a.compare(b)) == -sign(b.compare(a))
  }

  property("compare is transitive") = forAll(genPos, genPos, genPos) { (x, y, z) =>
    val Seq(a, b, c) = Seq(x, y, z).sortWith((l, r) => l.compare(r) <= 0)
    (a.compare(b) <= 0 && b.compare(c) <= 0) ==> Prop(a.compare(c) <= 0)
  }

  property("compare agrees with (name, pos) lexicographic order") =
    forAll(genPos, genPos) { (a, b) =>
      val expect = Ordering.Tuple2[String, Long].compare((a.name, a.pos), (b.name, b.pos))
      sign(a.compare(b)) == sign(expect)
    }

  property("tryCompare across server_ids is None (incomparable)") =
    forAll(genPos, genPos) { (a, b) =>
      val b2 = b.copy(serverId = 2L)
      a.tryCompare(b2).isEmpty
    }

  private val genIntervals: Gen[Vector[(Long, Long)]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, for {
      lo <- Gen.chooseNum(1L, 500L)
      len <- Gen.chooseNum(0L, 50L)
    } yield (lo, lo + len)).map(_.toVector))

  private val uuidA = "de278ad0-2106-11e4-9f8e-6edd0ca20947"
  private val uuidB = "11111111-2222-3333-4444-555555555555"

  private val genGtid: Gen[GtidSet] = for {
    ia <- genIntervals
    ib <- genIntervals
    useB <- Gen.oneOf(true, false)
  } yield GtidSet(
    if (useB) Map(uuidA -> GtidSet.normalize(ia), uuidB -> GtidSet.normalize(ib))
    else Map(uuidA -> GtidSet.normalize(ia)))

  property("parse ∘ toString = id (normalized)") = forAll(genGtid) { g =>
    GtidSet.parse(g.toString) == g
  }

  property("union contains both operands") = forAll(genGtid, genGtid) { (a, b) =>
    val u = a.union(b)
    u.contains(a) && u.contains(b)
  }

  property("contains is reflexive; add makes the gno contained") =
    forAll(genGtid, Gen.chooseNum(1L, 1000L)) { (g, gno) =>
      g.contains(g) && g.add(uuidA, gno).contains(GtidSet(Map(uuidA -> Vector((gno, gno)))))
    }
}
