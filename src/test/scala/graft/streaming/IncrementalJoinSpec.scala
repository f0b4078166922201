package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The retraction-aware join maintainer must equal the batch recompute
  * (the c06 shape: latest-per-key per side, tombstones absent, inner
  * join) after ANY batch split of an ordered tagged change log — with
  * updates that change a joined row, deletes that retract it, and
  * re-inserts that bring it back. The emitted changelog must replay to
  * the view, and a replayed batch id must be a no-op. */
class IncrementalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // tagged change: (side, user_id, event_id, us, value); value<1.0 deletes
  private type Chg = (String, Long, Long, Long, Double)

  private def chgDf(cs: Seq[Chg]) = {
    import spark.implicits._
    cs.toDF("side", "user_id", "event_id", "us", "value")
  }

  private type ViewRow = (Long, Long, Double, Long, Double)

  /** Batch recompute over the full log — the c06 semantics. */
  private def expected(cs: Seq[Chg]): Set[ViewRow] = {
    def sideState(side: String): Map[Long, (Long, Double)] =
      cs.filter(_._1 == side)
        .groupBy(_._2)
        .flatMap { case (u, rows) =>
          val (_, _, eid, _, v) = rows.maxBy(r => (r._4, r._3))
          if (v >= 1.0) Some(u -> (eid, v)) else None
        }
    val l = sideState("L"); val r = sideState("R")
    (l.keySet & r.keySet).map { u =>
      (u, l(u)._1, l(u)._2, r(u)._1, r(u)._2)
    }
  }

  private def viewOf(root: String): Set[ViewRow] = {
    import spark.implicits._
    IncrementalJoin.read(spark, root).get
      .select("user_id", "l_event_id", "l_value", "r_event_id", "r_value")
      .as[ViewRow].collect().toSet
  }

  // interleaved log: users 0..4, alternating sides; every third change on
  // a side is a tombstone (value 0.5), later overwritten — so the view
  // sees inserts, updates, retractions, and re-inserts
  private def log(users: Int, perUser: Int): Seq[Chg] =
    (for (u <- 0 until users; k <- 0 until perUser; s <- Seq("L", "R")) yield {
      val v = if ((u + k + (if (s == "L") 0 else 1)) % 3 == 0) 0.5 else 10.0 + u + k
      (s, u.toLong, (u * 1000 + k * 10 + (if (s == "L") 0 else 1)).toLong,
        1000L * k + 10L * u, v)
    }).sortBy(c => (c._4, c._3))

  test("maintained join equals the batch recompute for any batch split") {
    val full = log(users = 5, perUser = 4)
    val n = full.size
    for (splits <- Seq(Seq(n), Seq(7, n), Seq(3, 9, 17, n))) {
      val root = Files.createTempDirectory("ijoin").toString
      var from = 0
      splits.zipWithIndex.foreach { case (to, i) =>
        val out = IncrementalJoin.merge(chgDf(full.slice(from, to)), i.toLong, root)
        assert(out.isDefined)
        from = to
      }
      assert(viewOf(root) === expected(full), s"mismatch for split $splits")
    }
  }

  test("the emitted changelog replays to the view; replayed batch id is a no-op") {
    import spark.implicits._
    val full = log(users = 4, perUser = 3)
    val root = Files.createTempDirectory("ijoin-cl").toString
    val splits = Seq(5, 11, full.size)
    var from = 0
    var applied = Map.empty[Long, (Long, Double, Long, Double)]
    splits.zipWithIndex.foreach { case (to, i) =>
      val cl = IncrementalJoin.merge(chgDf(full.slice(from, to)), i.toLong, root).get
        .as[(String, Long, Long, Double, Long, Double)].collect()
      // view keys are unique, so the changelog applies as retract-then-insert
      cl.filter(_._1 == "-").foreach { c =>
        assert(applied.get(c._2).contains((c._3, c._4, c._5, c._6)),
          s"retraction of a row not in the view: $c")
        applied -= c._2
      }
      cl.filter(_._1 == "+").foreach { c =>
        assert(!applied.contains(c._2), s"insert over a live row: $c")
        applied += c._2 -> ((c._3, c._4, c._5, c._6))
      }
      from = to
    }
    val v = viewOf(root)
    assert(applied.map { case (u, (le, lv, re, rv)) => (u, le, lv, re, rv) }.toSet === v)
    assert(v === expected(full))
    // replay: same final batch id again → None, view unchanged
    assert(IncrementalJoin.merge(
      chgDf(full.slice(11, full.size)), (splits.size - 1).toLong, root).isEmpty)
    assert(viewOf(root) === expected(full))
  }

  test("fuzz: random tagged logs under random batch splits match the recompute") {
    for (seed <- Seq(11L, 42L, 77L)) {
      val rnd = new scala.util.Random(seed)
      // random interleaved log over few keys (maximizes state collisions);
      // ~1/3 tombstones; us strictly increasing so per-key order holds
      val full = (0 until 60).map { i =>
        val side = if (rnd.nextBoolean()) "L" else "R"
        val u = rnd.nextInt(4).toLong
        val v = if (rnd.nextInt(3) == 0) 0.5 else 1.0 + rnd.nextInt(100)
        (side, u, 1000L + i, i.toLong * 10, v)
      }
      // random monotone split points
      val cuts = (Seq(full.size) ++ Seq.fill(rnd.nextInt(4))(1 + rnd.nextInt(full.size - 1)))
        .distinct.sorted
      val root = Files.createTempDirectory(s"ijoin-fuzz$seed").toString
      var from = 0
      cuts.zipWithIndex.foreach { case (to, i) =>
        IncrementalJoin.merge(chgDf(full.slice(from, to)), i.toLong, root)
        from = to
      }
      assert(viewOf(root) === expected(full), s"seed $seed splits $cuts")
    }
  }

  test("replaying the real event log batch-wise reproduces the c06 batch query") {
    import spark.implicits._
    // the c06 tagged-changelog derivation over the driver testdata
    val tagged = graft.TestTables.events(spark)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("side",
        when(col("event_type").isin("click", "view"), "L")
          .when(col("event_type").isin("purchase", "signup"), "R"))
      .filter(col("side").isNotNull)
      .select("side", "user_id", "event_id", "us", "value")
      .as[(String, Long, Long, Long, Double)]
      .collect().sortBy(c => (c._4, c._3)) // global (us, event_id) order
    val root = Files.createTempDirectory("ijoin-c06").toString
    tagged.grouped((tagged.length + 3) / 4).zipWithIndex.foreach { case (chunk, i) =>
      assert(IncrementalJoin.merge(chgDf(chunk.toSeq), i.toLong, root).isDefined)
    }
    val batch = graft.SparkEntry.queries("c06_changelog_join")(spark, graft.TestTables.sfDir)
      .as[ViewRow].collect().toSet
    assert(viewOf(root) === batch)
    assert(batch.nonEmpty)
  }
}
