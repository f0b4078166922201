package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized fuzzing of the two custom physical operators against
  * plain-Scala reference implementations — many keys, heavy ties, empty
  * sides, single hot key, random partitioning. Deterministic (fixed
  * seeds), so a failure is a reproducible counterexample. */
class PlansRandomizedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("plans-randomized-spec")
    .config("spark.sql.shuffle.partitions", "3")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.optimizer.excludedRules", "graft.plans.RankFilterToTopK")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def genRows(seed: Long, n: Int, keys: Int, times: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (rnd.nextInt(keys).toLong, rnd.nextInt(times).toLong, i.toLong))
  }

  test("TopKPerKey equals the Scala reference on random data (ties, hot keys)") {
    import spark.implicits._
    for ((seed, n, keys, times, k) <- Seq(
        (1L, 500, 7, 10, 3), (2L, 1000, 1, 5, 4), // single hot key
        (3L, 200, 50, 100, 1), (4L, 0, 5, 5, 2), // empty input
        (5L, 777, 13, 2, 5))) { // massive time ties, idx breaks them
      val rows = genRows(seed, n, keys, times)
      val df = rows.toDF("k", "t", "idx").repartition(5)
      val got = TopK.perKey(df, Seq("k"), Seq("t" -> true, "idx" -> true), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = rows.groupBy(_._1).valuesIterator
        .flatMap(_.sortBy(r => (r._2, r._3)).take(k)).toSet
      assert(got === expect, s"seed=$seed n=$n keys=$keys k=$k")
    }
  }

  test("AsOfJoin matched time equals the Scala reference on random data") {
    import spark.implicits._
    for ((seed, nl, nr, keys, times) <- Seq(
        (11L, 300, 300, 5, 20), (12L, 200, 0, 5, 10), // empty right
        (13L, 0, 200, 5, 10), (14L, 400, 50, 1, 8), // one hot key, sparse right
        (15L, 250, 250, 40, 3))) { // many keys, massive ties
      val lrows = genRows(seed, nl, keys, times)
      val rrows = genRows(seed + 100, nr, keys, times)
      val l = lrows.toDF("k", "t", "idx").repartition(4)
      val r = rrows.toDF("rk", "rt", "ridx").repartition(3)
      // compare the matched right TIME (ties in rt are all equivalent
      // matches; the right payload among equal times is unspecified)
      val got = AsOf.join(l, r, "k", "rk", "t", "rt")
        .select("k", "t", "idx", "rt")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
      val byKey = rrows.groupBy(_._1)
      val expect = lrows.map { case (k, t, idx) =>
        val prior = byKey.getOrElse(k, Nil).filter(_._2 <= t)
        (k, t, idx, if (prior.isEmpty) -1L else prior.map(_._2).max)
      }.toSet
      assert(got === expect, s"seed=$seed nl=$nl nr=$nr keys=$keys")
    }
  }
}
