package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Kernel laws for the sorted-merge intersection count: agreement with
  * set intersection on sorted-distinct inputs (the caller contract),
  * symmetry, the containment bound, and sorted-bag min-multiplicity
  * semantics on inputs with duplicates. */
object SortedIntersectCountProps extends Properties("SortedIntersectCount") {

  private val genSet: Gen[Array[Long]] =
    Gen.chooseNum(0, 96).flatMap(n =>
      Gen.containerOfN[Set, Long](n, Gen.chooseNum(-1000L, 1000L))
        .map(_.toArray.sorted))

  private val genBag: Gen[Array[Long]] =
    Gen.chooseNum(0, 96).flatMap(n =>
      Gen.containerOfN[Array, Long](n, Gen.chooseNum(-40L, 40L)).map(_.sorted))

  private def cnt(a: Array[Long], b: Array[Long]): Long =
    SortedIntersectCount.compute(new GenericArrayData(a), new GenericArrayData(b))

  property("set semantics on sorted-distinct inputs") =
    forAll(genSet, genSet) { (a, b) => cnt(a, b) == (a.toSet & b.toSet).size.toLong }

  property("symmetric") =
    forAll(genBag, genBag) { (a, b) => cnt(a, b) == cnt(b, a) }

  property("bounded by the smaller side") =
    forAll(genBag, genBag) { (a, b) => cnt(a, b) <= math.min(a.length, b.length) }

  property("bag semantics: min multiplicity per element") =
    forAll(genBag, genBag) { (a, b) =>
      val ma = a.groupBy(identity).view.mapValues(_.length)
      val mb = b.groupBy(identity).view.mapValues(_.length)
      cnt(a, b) == ma.keys.toSeq.map(k => math.min(ma(k), mb.getOrElse(k, 0))).sum.toLong
    }

  property("self-intersection is the full length") =
    forAll(genBag) { a => cnt(a, a) == a.length.toLong }
}
