package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Kernel laws for the native dot-product expression: agreement with the
  * reference fold (including Long-wrap overflow semantics — what the
  * interpreted `aggregate(zip_with(...))` form computes), symmetry, and
  * the min-length bound on ragged inputs. */
object LongDotProps extends Properties("LongDot") {

  private val genVec: Gen[Array[Long]] =
    Gen.chooseNum(0, 128).flatMap(n =>
      Gen.containerOfN[Array, Long](n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  private def ref(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 } // wraps exactly like the kernel
    acc
  }

  private def dot(a: Array[Long], b: Array[Long]): Long =
    LongDot.compute(new GenericArrayData(a), new GenericArrayData(b))

  property("matches the fold reference, overflow included") =
    forAll(genVec, genVec) { (a, b) => dot(a, b) == ref(a, b) }

  property("symmetric") =
    forAll(genVec, genVec) { (a, b) => dot(a, b) == dot(b, a) }

  property("self-dot of small vectors is the exact squared norm") =
    forAll(Gen.containerOfN[Array, Long](64, Gen.chooseNum(-(1L << 25), 1L << 25))) { a =>
      dot(a, a) == a.map(x => BigInt(x) * BigInt(x)).sum.toLong
    }
}
