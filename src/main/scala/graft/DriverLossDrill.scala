package graft

import java.nio.file.{Files, Paths}

/** Driver-loss drill: SIGKILLs the WRITER JVM itself, repeatedly, at
  * varied points inside delta-applying merges, then proves the maintained
  * state still equals the exact one-shot recompute.
  *
  * Split of proof with the other drills: [[StreamStateLossDrill]] /
  * [[IvfFoldLossDrill]] kill an EXECUTOR and exercise task retry under a
  * surviving driver; the deterministic specs (IncrementalAggSpec,
  * SnapshotStoreWriterRaceSpec) manufacture single chosen crash points by
  * deleting markers. What neither exercises is the full driver-death
  * story: a real process kill at an UNCHOSEN point — mid parquet job, mid
  * staging rename, between `_MANIFEST` and `_COMMIT`, before or after the
  * replay-guard read — followed by a cold restart that replays the whole
  * op log, exactly like a restarted streaming query replaying offsets
  * onto a transactional sink. This drill runs that loop: a child writer
  * JVM ([[DriverLossChild]]) replays batches 0..n through the
  * non-idempotent [[graft.streaming.IncrementalAgg]]; the drill kills it
  * on a `BATCH_START` line after a seeded jitter (spreading kills across
  * the merge window), restarts it from scratch several rounds, lets a
  * final run complete, and gates on: state == exact recompute of the
  * surviving rows, the recorded batch id == last batch, no staging
  * leftovers survive the final run, and at least one kill landed INSIDE
  * a merge (a START with no DONE) — otherwise the run is vacuous.
  *
  * Run (after `sbt package`; the child JVM boots from /opt/spark/jars +
  * the packaged jar):
  * {{{
  * SPARK_GRAFT_JARS=target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar \
  *   sbt -batch "runMain graft.DriverLossDrill"
  * }}}
  * Emits one JSON line and `DRILL_driver_loss.json`; exits non-zero on a
  * mismatch, a vacuous run, or staging/replay-guard residue.
  */
object DriverLossDrill {

  // op log: (op, id, grp_old, amount_old, grp_new, amount_new) — the
  // IncrementalAgg.deltas contract, with id kept for the exact recompute
  private type Op = (String, Long, String, java.lang.Double, String, java.lang.Double)

  private def grp(id: Long): String = s"g${id % 5}"
  private def amt(id: Long): Double = id * 0.25 + 0.125

  /** Deterministic op log, generated STATEFULLY against the same row map
    * the truth replays: every update/move/delete records the row's TRUE
    * current (grp, amount) as its old values — the CDC contract the delta
    * algebra retracts against — and each id is touched at most once per
    * batch. Batch 0 inserts; later batches mix in-place updates,
    * group-moving updates, deletes and fresh inserts, so merges touch
    * several groups and some batches empty groups out. Returns the
    * batches and the exact end-state aggregate. */
  private def buildLog(nBatches: Int)
      : (Seq[Seq[Op]], Map[String, (Long, BigDecimal)]) = {
    val rows = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Double)]
    val rnd = new scala.util.Random(20260816L)
    val batches = Seq.newBuilder[Seq[Op]]

    val b0 = (0L until 120L).map { id =>
      rows(id) = (grp(id), amt(id))
      ("i", id, null, null: java.lang.Double, grp(id), java.lang.Double.valueOf(amt(id)))
    }
    batches += b0

    (1 until nBatches).foreach { b =>
      val ops = Seq.newBuilder[Op]
      val picks = rnd.shuffle(rows.keys.toVector).take(26)
      val (toUpd, rest) = picks.splitAt(12)
      val (toMove, toDel) = rest.splitAt(8)
      toUpd.foreach { id =>
        val (g, a) = rows(id)
        val a2 = a + b
        ops += (("u", id, g, java.lang.Double.valueOf(a), g, java.lang.Double.valueOf(a2)))
        rows(id) = (g, a2)
      }
      toMove.foreach { id =>
        val (g, a) = rows(id)
        val g2 = s"g${(id + b) % 5}"
        ops += (("u", id, g, java.lang.Double.valueOf(a), g2, java.lang.Double.valueOf(a)))
        rows(id) = (g2, a)
      }
      toDel.foreach { id =>
        val (g, a) = rows(id)
        ops += (("d", id, g, java.lang.Double.valueOf(a), null, null: java.lang.Double))
        rows.remove(id)
      }
      (b * 1000L until b * 1000L + 10L).foreach { id =>
        ops += (("i", id, null, null: java.lang.Double, grp(id), java.lang.Double.valueOf(amt(id))))
        rows(id) = (grp(id), amt(id))
      }
      batches += ops.result()
    }

    val truth = rows.values.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.size.toLong, vs.map(v => BigDecimal(v._2).setScale(10)).sum)
    }
    (batches.result(), truth)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DRILL_BATCHES", "10").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_DRILL_ROUNDS", "6").toInt
    val jar = sys.env.getOrElse("SPARK_GRAFT_JARS",
      "target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar")
    val spark = GraftSession.builder(8)
      .master("local[8]")
      .appName("driver-loss-drill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val opsDir = Files.createTempDirectory("drill-driver-ops").toString
    val stateRoot = Files.createTempDirectory("drill-driver-state").toString
    val (slices, truth) = buildLog(nBatches)
    slices.zipWithIndex.foreach { case (s, b) =>
      s.toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
        .coalesce(1).write.parquet(s"$opsDir/b=$b")
    }

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = "/opt/spark/jars/*:" + new java.io.File(jar).getAbsolutePath
    def newChild(): Process = new ProcessBuilder(
      javaBin, "-Xmx3g", "-cp", cp, "graft.DriverLossChild",
      stateRoot, opsDir, nBatches.toString)
      .redirectErrorStream(false)
      .redirectError(Files.createTempFile("drill-child-err", ".log").toFile)
      .start()

    // a SIGKILLed child's stdout surfaces as "Stream closed" IOException,
    // not a null EOF — treat both as end-of-stream
    def readLineSafe(r: java.io.BufferedReader): String =
      try r.readLine() catch { case _: java.io.IOException => null }

    val rnd = new scala.util.Random(20260816L)
    val t0 = System.nanoTime()
    var kills = 0
    var midMergeKills = 0
    (0 until rounds).foreach { r =>
      val p = newChild()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      // kill on the first BATCH_START at-or-past the round's target batch,
      // after a jitter that sweeps the merge window (incl. the commit tail)
      val targetBatch = r % nBatches
      var started = -1
      var done = -1
      var killed = false
      var line = readLineSafe(out)
      while (line != null && !killed) {
        line match {
          case s if s.startsWith("BATCH_START ") =>
            started = s.stripPrefix("BATCH_START ").trim.toInt
            if (started >= targetBatch) {
              Thread.sleep(rnd.nextInt(1200).toLong)
              p.destroyForcibly()
              killed = true
              kills += 1
            }
          case s if s.startsWith("BATCH_DONE ") =>
            done = s.stripPrefix("BATCH_DONE ").trim.toInt
          case _ => ()
        }
        if (!killed) line = readLineSafe(out)
      }
      p.waitFor()
      // the child may have completed `started` before the SIGKILL landed;
      // drain its remaining output to classify the kill honestly
      var tail = readLineSafe(out)
      while (tail != null) {
        if (tail.startsWith("BATCH_DONE "))
          done = tail.stripPrefix("BATCH_DONE ").trim.toInt
        tail = readLineSafe(out)
      }
      if (killed && started > done) midMergeKills += 1
      println(s"[drill] round $r: killed=$killed started=$started done=$done")
    }
    // final, unkilled run must replay the whole log to completion
    val fin = newChild()
    val finOut = new java.io.BufferedReader(
      new java.io.InputStreamReader(fin.getInputStream))
    Iterator.continually(readLineSafe(finOut)).takeWhile(_ != null).foreach(_ => ())
    val finalExit = fin.waitFor()
    val totalMs = (System.nanoTime() - t0) / 1000000L

    val got = graft.streaming.IncrementalAgg.read(spark, stateRoot).get
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap
    val matches = got == truth
    val lastBatch = graft.streaming.SnapshotStore.lastBatchId(stateRoot)
    val stagingLeft = Option(new java.io.File(stateRoot).listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("_staging_"))
    val vacuous = midMergeKills < 1

    val json = s"""{"metric":"driver_loss_drill","batches":$nBatches,""" +
      s""""rounds":$rounds,"kills":$kills,"mid_merge_kills":$midMergeKills,""" +
      s""""final_exit":$finalExit,"total_ms":$totalMs,"groups":${got.size},""" +
      s""""last_batch_id":$lastBatch,"staging_leftover":$stagingLeft,""" +
      s""""state_matches_truth":$matches,"vacuous":$vacuous,""" +
      s""""maintainer":"IncrementalAgg (non-idempotent delta merge), cold JVM replay from batch 0 each round"}"""
    Files.write(Paths.get("DRILL_driver_loss.json"), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!matches || vacuous || finalExit != 0 ||
      lastBatch != nBatches - 1L || stagingLeft != 0) sys.exit(1)
  }
}
