package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic harness — contents change per investigation.
  * Current probe: where do p16_dup_graph_bfs's ~3s go? Times each BFS
  * iteration's fused materialize+count job and the final consumer
  * separately, in a warm session. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("DIAG_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm pass builds every shared cache (labels, symmetric edges)
    SparkEntry.queries("p16_dup_graph_bfs")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def tt[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (pass <- 1 to 3) {
      println(s"=== pass $pass ===")
      val labels = tt("labels (cached)") { graft.analytics.Curation.dupClusterLabels(spark, sfDir) }
      val edges = tt("edges (cached)") { graft.analytics.Curation.symmEdges(spark, sfDir) }
      var (batch, batchN) = tt("level0 mat+count") {
        GraftSession.materializeCounted(
          labels.select($"lab").distinct()
            .select($"lab".as("node"), lit(0L).as("hops")))
      }
      var levels = List(batch)
      var hop = 0L
      while (batchN > 0) {
        val visited = levels.map(_.select($"node")).reduce(_ unionByName _)
        def expand(src: org.apache.spark.sql.DataFrame) = src.as("f")
          .join(edges.as("e"), $"f.node" === $"e.src")
          .select($"e.dst".as("node"), ($"f.hops" + 1L).as("hops"))
          .groupBy($"node").agg(min($"hops").as("hops"))
        val next1 = expand(batch.filter($"hops" === hop))
          .join(visited, Seq("node"), "left_anti")
        val next2 = expand(next1)
          .join(visited.unionByName(next1.select($"node")), Seq("node"), "left_anti")
        if (pass == 3) {
          val ep = next1.unionByName(next2).queryExecution.executedPlan.toString
          println(s"[diag]   plan: Exchange=${"Exchange".r.findAllIn(ep).size} " +
            s"BHJ=${"BroadcastHashJoin".r.findAllIn(ep).size} " +
            s"SMJ=${"SortMergeJoin".r.findAllIn(ep).size} " +
            s"Sort=${"\\bSort\\b".r.findAllIn(ep).size} lines=${ep.linesIterator.size}")
        }
        val (nb, nn) = tt(s"batch hop=${hop + 1},${hop + 2}") {
          GraftSession.materializeCounted(next1.unionByName(next2))
        }
        println(s"[diag]   rows=$nn")
        levels ::= nb
        batch = nb
        batchN = nn
        hop += 2L
      }
      tt("final consumer") {
        levels.reduce(_ unionByName _)
          .join(labels, "node")
          .select($"node".as("doc_id"), $"lab".as("rep"), $"hops")
          .orderBy($"rep", $"hops", $"doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
