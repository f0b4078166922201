package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Targeted gates for the round-8 curation operators.
  *
  * p13's waterfilling has a closed-form subtlety the oracle corpus can't
  * reach (its budget caps only the LAST language): whenever the first
  * capped language is not the last one, every later language's
  * remaining-budget share is arithmetically GUARANTEED to dip below the
  * true cap — so a "min cap_row over capped rows" implementation
  * undershoots. This spec pins the correct behavior on the smallest such
  * instance. p12's claim is a plan shape (TopKPerKey, not a window sort),
  * which the oracle can't see at all.
  */
class CurationOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("curation-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("p13 waterfilling: cap comes from the FIRST capped row, not the " +
      "minimum share among capped rows") {
    import spark.implicits._
    // supplies 10/50/60 tokens, budget = 80% of 120 = 96:
    //   r1 (aa, 10): share 96/3 = 32 >= 10       -> keeps its supply
    //   r2 (bb, 50): share (96-10)/2 = 43 < 50   -> first capped, cap = 43
    //   r3 (cc, 60): share 96-10-50 = 36 < 43    -> the dip; must get 43
    // A min-over-capped-rows implementation returns 36 and under-allocates.
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val dir = Files.createTempDirectory("p13edge").toString
    Seq(
      (1L, words(10), "aa", "s0", 0L),
      (2L, words(50), "bb", "s0", 0L),
      (3L, words(60), "cc", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("p13_unimax_budget")(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("aa", 10L, 10L, false),
      ("bb", 50L, 43L, true),
      ("cc", 60L, 43L, true)), s"got: ${out.toSeq}")
    // the allocation exhausts the budget exactly on this instance
    assert(out.map(_._3).sum == 96L)
  }

  test("p12 runs on TopKPerKey — no window sort of a source's documents") {
    val df = graft.SparkEntry.queries("p12_source_quota_cap")(
      spark, graft.TestTables.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(!plan.contains("WindowExec"), s"window sort crept back in:\n$plan")
  }

  test("p18 admits through TopKPerKey and never window-sorts a source") {
    val df = graft.SparkEntry.queries("p18_corpus_build_report")(
      spark, graft.TestTables.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"quota stage lost the custom exec:\n$plan")
    assert(!plan.contains("WindowExec"), s"window sort crept into the funnel:\n$plan")
    // the funnel monotonically shrinks and the quota cap holds
    import spark.implicits._
    val rows = df.as[(String, Long, Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (src, in, q, e, c, adm, _) =>
      assert(in >= q && q >= e && e >= c && c >= adm, s"$src not monotone")
      assert(adm <= 8, s"$src quota exceeded")
    }
  }

  test("m10 clusters are connected: edge count per cluster covers a spanning tree " +
      "and the union graph never splits a text-only cluster") {
    import spark.implicits._
    val dir = graft.TestTables.sfDir
    val m10 = graft.SparkEntry.queries("m10_crossmodal_clusters")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(m10.nonEmpty)
    m10.foreach { case (rep, size, maxDoc, nText, nImage) =>
      // a connected component of `size` nodes needs >= size-1 edges
      assert(nText + nImage >= size - 1, s"cluster $rep under-connected")
      assert(maxDoc >= rep && size >= 1)
    }
    // adding image edges only MERGES components: the union graph covers
    // at least every text-edge-touched node, in at most as many clusters,
    // and its largest cluster is at least as large as the text-only max
    val p03 = graft.SparkEntry.queries("p03_dup_clusters")(spark, dir)
      .select("cluster_rep", "size").as[(Long, Long)].collect()
    assert(m10.map(_._2).sum >= p03.map(_._2).sum, "union graph lost nodes")
    assert(m10.map(_._2).max >= p03.map(_._2).max, "largest cluster shrank")
    assert(m10.map(_._4).sum == graft.analytics.Dedup.simhashPairs(spark, dir).count(),
      "text edges must be fully attributed to clusters")
  }

  test("p16 BFS levels are sound: hops=0 iff representative, every deeper " +
      "node has a neighbor one level up, and labels/BFS agree on membership") {
    import spark.implicits._
    val dir = graft.TestTables.sfDir
    val bfs = graft.SparkEntry.queries("p16_dup_graph_bfs")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(bfs.nonEmpty)
    // one row per node; rep is the component minimum, so hops=0 iff node==rep
    assert(bfs.map(_._1).distinct.length == bfs.length)
    bfs.foreach { case (node, rep, hops) =>
      assert((hops == 0L) == (node == rep), s"($node,$rep,$hops)")
      assert(node >= rep)
    }
    // BFS invariant: a node at level h>0 has some neighbor at level h-1,
    // and no neighbor more than one level away (else hops wouldn't be
    // the MINIMUM hop count)
    val pairs = graft.analytics.Dedup.simhashPairs(spark, dir)
      .select("i", "j").as[(Long, Long)].collect()
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val level = bfs.map { case (n, _, h) => n -> h }.toMap
    bfs.foreach { case (node, _, hops) =>
      if (hops > 0L)
        assert(adj(node).exists(nb => level(nb) == hops - 1), s"node $node stranded at $hops")
      adj(node).foreach { nb =>
        assert(math.abs(level(nb) - hops) <= 1L, s"edge $node->$nb skips a level")
      }
    }
  }
}
