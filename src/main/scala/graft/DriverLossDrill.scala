package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-loss drill: SIGKILLs the WRITER JVM itself, repeatedly, at
  * varied points inside each maintainer's merge, then proves the
  * maintained state still equals the exact one-shot recompute.
  *
  * Split of proof with the other drills: [[StreamStateLossDrill]] /
  * [[IvfFoldLossDrill]] kill an EXECUTOR and exercise task retry under a
  * surviving driver; the deterministic specs manufacture single chosen
  * crash points by deleting markers. What neither exercises is the full
  * driver-death story: a real process kill at an UNCHOSEN point — mid
  * parquet job, mid publish, between a multi-artifact commit's stores —
  * followed by a cold restart that replays the whole op log, exactly like
  * a restarted streaming query replaying offsets onto a transactional
  * sink. This drill runs that loop PER MAINTAINER, covering the riskiest
  * multi-artifact commit windows the round-13 audit named:
  *
  *  - `agg`     — non-idempotent delta merge (single bucketed store);
  *  - `gapfill` — obs-then-view TWO-store commit: a kill between the two
  *                writes leaves obs ahead of view, and the view-gated
  *                replay must re-merge (idempotent) and complete the view;
  *  - `scd`     — close-then-append history rewrite;
  *  - `shard`   — the bucketed READ-PRUNED store's manifest commit path
  *                ([[graft.streaming.IncrementalShardManifest]]:
  *                readTouched + writeNextBuckets — the manifest that
  *                carries untouched buckets forward is itself part of
  *                the commit, so a torn write must not strand or double
  *                any bucket), added r17 so every commit-path variant is
  *                SIGKILL-drilled on all three substrates;
  *  - `ivf`     — delta dir + cells snapshot + fold ledger, with
  *                `maxDeltaDirs=2` forcing folds into the kill window.
  *
  * Each maintainer: a child writer JVM ([[DriverLossChild]]) replays
  * batches 0..n; the drill kills it on a `BATCH_START` line after a
  * seeded jitter (spreading kills across the merge window), restarts it
  * from scratch several rounds, lets a final run complete, and gates on:
  * state == the exact ONE-SHOT recompute (all ops merged as a single
  * batch into a fresh root — associativity/idempotence of each merge is
  * separately spec-pinned by the maintainer parity suites), the recorded
  * batch id == last batch, zero staging/orphan residue after the final
  * run, and at least one kill landed INSIDE a merge (non-vacuous).
  *
  * `SPARK_GRAFT_DRILL_FS=objsim` points every state root at the simulated
  * object store ([[graft.streaming.ObjStoreSimFs]] — atomic conditional
  * PUT, non-atomic copy+delete rename), driving the SnapshotStore
  * object-store committer AND IncrementalIvf's ledger-driven fold layout
  * (fold dirs at final `fold=<seq>.<uuid>` names, conditional-PUT ledger
  * publish — no rename on the commit path) through the same kill sweep.
  * `SPARK_GRAFT_DRILL_FS=fileobj` keeps posix state roots but FORCES the
  * object committer onto them (`spark.graft.snapshot.committer=object` in
  * both the child writer and this drill's truth-side session) — the third
  * legal substrate pairing, whose commit publish is the scheme-matched
  * tmp + exclusive-rename path (a bare create-at-final-name there could be
  * torn by exactly these SIGKILLs; the round-16 fix under drill).
  * State dumps compare as sorted MULTISETS, so a replay that re-appends
  * a byte-identical row (duplicated SCD version, doubled fold rows)
  * fails the gate instead of collapsing into a set.
  *
  * Run (after `sbt package`; the child JVM boots from `$SPARK_HOME/jars`
  * + the packaged jar):
  * {{{
  * SPARK_GRAFT_JARS=target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar \
  *   sbt -batch "runMain graft.DriverLossDrill"
  * }}}
  * Emits one JSON line and `DRILL_driver_loss.json` (fs=file) or
  * `DRILL_driver_loss_objsim.json` (fs=objsim); exits non-zero on any
  * mismatch, vacuous sweep, or residue.
  */
object DriverLossDrill {

  // ------------------------------------------------------------ op logs

  // agg op log: (op, id, grp_old, amount_old, grp_new, amount_new) — the
  // IncrementalAgg.deltas contract. Generated STATEFULLY against the same
  // row map a CDC source would maintain: every update/move/delete records
  // the row's TRUE current (grp, amount) as its old values, and each id is
  // touched at most once per batch.
  private type AggOp = (String, Long, String, java.lang.Double, String, java.lang.Double)

  private def aggLog(nBatches: Int): Seq[Seq[AggOp]] = {
    def grp(id: Long): String = s"g${id % 5}"
    def amt(id: Long): Double = id * 0.25 + 0.125
    val rows = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Double)]
    val rnd = new scala.util.Random(20260816L)
    val batches = Seq.newBuilder[Seq[AggOp]]
    val b0 = (0L until 120L).map { id =>
      rows(id) = (grp(id), amt(id))
      ("i", id, null, null: java.lang.Double, grp(id), java.lang.Double.valueOf(amt(id)))
    }
    batches += b0
    (1 until nBatches).foreach { b =>
      val ops = Seq.newBuilder[AggOp]
      val picks = rnd.shuffle(rows.keys.toVector).take(26)
      val (toUpd, rest) = picks.splitAt(12)
      val (toMove, toDel) = rest.splitAt(8)
      toUpd.foreach { id =>
        val (g, a) = rows(id); val a2 = a + b
        ops += (("u", id, g, java.lang.Double.valueOf(a), g, java.lang.Double.valueOf(a2)))
        rows(id) = (g, a2)
      }
      toMove.foreach { id =>
        val (g, a) = rows(id); val g2 = s"g${(id + b) % 5}"
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
    batches.result()
  }

  private def prepareAgg(spark: SparkSession, opsDir: String, n: Int): Unit = {
    import spark.implicits._
    aggLog(n).zipWithIndex.foreach { case (s, b) =>
      s.toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
        .coalesce(1).write.parquet(s"$opsDir/b=$b")
    }
  }

  private def prepareGapFill(spark: SparkSession, opsDir: String, n: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    var eid = 0L
    (0 until n).foreach { b =>
      val rows = (0 until 40).map { _ =>
        val user = rnd.nextInt(20).toLong
        val us = (400000L + rnd.nextInt(120)) * 3600000000L + rnd.nextInt(3600) * 1000000L
        eid += 1
        val value: java.lang.Double =
          if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextInt(10000) / 100.0)
        (user, us, eid, value)
      }
      rows.toDF("user_id", "us", "event_id", "value")
        .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
          col("event_id"), col("value"))
        .coalesce(1).write.parquet(s"$opsDir/b=$b")
    }
  }

  private def prepareScd(spark: SparkSession, opsDir: String, n: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    var us = 0L
    var eid = 0L
    (0 until n).foreach { b =>
      val rows = (0 until 30).map { _ =>
        val user = rnd.nextInt(10).toLong
        us += 1000000L + rnd.nextInt(500000) // strictly increasing (W1 order)
        eid += 1
        (user, eid, us, s"v$eid")
      }
      rows.toDF("user_id", "event_id", "us", "value")
        .coalesce(1).write.parquet(s"$opsDir/b=$b")
    }
  }

  private def prepareShard(spark: SparkSession, opsDir: String, n: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    (0 until n).foreach { b =>
      docs.filter(pmod(col("doc_id"), lit(n.toLong)) === b.toLong)
        .coalesce(1).write.parquet(s"$opsDir/b=$b")
    }
  }

  private def prepareIvf(spark: SparkSession, opsDir: String, n: Int): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = Tables.t(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
    graft.analytics.Similarity.ivfCentroids(spark, sfDir)
      .coalesce(1).write.parquet(s"$opsDir/cents")
    (0 until n).foreach { b =>
      emb.filter(pmod(col("vec_id"), lit(n.toLong)) === b.toLong)
        .write.parquet(s"$opsDir/b=$b")
    }
  }

  // ------------------------------------------------------ maintainer kit

  private def slices(spark: SparkSession, opsDir: String, n: Int): DataFrame =
    (0 until n).map(b => spark.read.parquet(s"$opsDir/b=$b")).reduce(_ unionByName _)

  private final case class Maint(
      name: String,
      prepare: (SparkSession, String, Int) => Unit,
      // exact recompute: ALL ops as one batch into a fresh truth root
      oneShot: (SparkSession, String, Int, String) => Unit,
      // canonical MULTISET dump of the maintained state at a root — a
      // sorted Seq, not a Set: a crash-replay bug that re-appends a
      // byte-identical row (e.g. a duplicated SCD version) must FAIL the
      // gate, and a Set compare would collapse exactly that duplicate
      state: (SparkSession, String) => Seq[String],
      // the store whose recorded batch id gates replay
      gateRoot: String => String,
      // store roots swept for staging/orphan residue
      stores: String => Seq[String])

  private def dump(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val maints = Seq(
    Maint("agg", prepareAgg,
      (s, ops, n, troot) => graft.streaming.IncrementalAgg.merge(slices(s, ops, n), 0L, troot),
      (s, root) => dump(graft.streaming.IncrementalAgg.read(s, root).get),
      identity, root => Seq(root)),
    Maint("gapfill", prepareGapFill,
      (s, ops, n, troot) => graft.streaming.IncrementalGapFill.merge(slices(s, ops, n), 0L, troot),
      (s, root) => dump(graft.streaming.IncrementalGapFill.view(s, root).get),
      root => s"$root/view", root => Seq(s"$root/obs", s"$root/view")),
    Maint("scd", prepareScd,
      (s, ops, n, troot) => graft.streaming.ScdHistory.merge(slices(s, ops, n), 0L, troot),
      (s, root) => dump(graft.streaming.ScdHistory.read(s, root).get),
      identity, root => Seq(root)),
    Maint("shard", prepareShard,
      (s, ops, n, troot) => graft.streaming.IncrementalShardManifest.merge(
        slices(s, ops, n), 0L, troot),
      (s, root) => dump(graft.streaming.SnapshotStore.read(s, root).get),
      identity, root => Seq(root)),
    Maint("ivf", prepareIvf,
      (s, ops, n, troot) => graft.streaming.IncrementalIvf.merge(
        slices(s, ops, n), s.read.parquet(s"$ops/cents"), 0L, troot),
      (s, root) => {
        val a = graft.streaming.IncrementalIvf.assignments(s, root)
          .select(col("cid"), col("cent_id"))
        val c = graft.streaming.SnapshotStore.read(s, s"$root/cells").get
        (a.collect().map("a:" + _.toString) ++
          c.collect().map("c:" + _.toString)).sorted.toSeq
      },
      root => s"$root/cells",
      root => Seq(s"$root/cells")))

  // ------------------------------------------------------------- drill

  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_DRILL_BATCHES", "10").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_DRILL_ROUNDS", "4").toInt
    val fsMode = sys.env.getOrElse("SPARK_GRAFT_DRILL_FS", "file")
    val chosen = sys.env.getOrElse("SPARK_GRAFT_DRILL_MAINTAINERS", "agg,gapfill,scd,shard,ivf")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val jar = sys.env.getOrElse("SPARK_GRAFT_JARS",
      "target/scala-2.13/dolphinbeatspark_2.13-0.1.0.jar")
    val builder = GraftSession.builder(8)
      .master("local[8]")
      .appName("driver-loss-drill")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop." + graft.streaming.ObjStoreSimFs.ImplConfKey,
        graft.streaming.ObjStoreSimFs.ImplClass)
    // fileobj: the truth-side one-shot writes must use the same forced
    // committer the child uses (reads are layout-detected and unaffected)
    if (fsMode == "fileobj")
      builder.config(graft.streaming.SnapshotStore.CommitterConfKey, "object")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def newRoot(tag: String): String = {
      val p = Files.createTempDirectory(s"drill-driver-$tag").toString
      if (fsMode == "objsim") s"objsim://$p" else p
    }

    val javaBin = System.getProperty("java.home") + "/bin/java"
    // Spark jars from SPARK_HOME (not a hardcoded path): the child JVM must
    // boot on whatever Spark install the parent runs against.
    val sparkJars = sys.env.getOrElse("SPARK_HOME", "/opt/spark") + "/jars/*"
    val cp = sparkJars + ":" + new java.io.File(jar).getAbsolutePath
    def newChild(maint: String, stateRoot: String, opsDir: String): Process = {
      val pb = new ProcessBuilder(
        javaBin, "-Xmx3g", "-cp", cp, "graft.DriverLossChild",
        maint, stateRoot, opsDir, nBatches.toString)
        .redirectErrorStream(false)
        .redirectError(Files.createTempFile("drill-child-err", ".log").toFile)
      if (fsMode == "fileobj") // the child forces the object committer too
        pb.environment().put("SPARK_GRAFT_DRILL_COMMITTER", "object")
      pb.start()
    }

    // a SIGKILLed child's stdout surfaces as "Stream closed" IOException,
    // not a null EOF — treat both as end-of-stream
    def readLineSafe(r: java.io.BufferedReader): String =
      try r.readLine() catch { case _: java.io.IOException => null }

    val t0 = System.nanoTime()
    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var allOk = true

    chosen.foreach { mName =>
      val m = maints.find(_.name == mName).getOrElse(
        sys.error(s"unknown maintainer '$mName'"))
      val opsDir = Files.createTempDirectory(s"drill-$mName-ops").toString
      val stateRoot = newRoot(mName)
      m.prepare(spark, opsDir, nBatches)

      val rnd = new scala.util.Random(20260816L + mName.hashCode)
      var kills = 0
      var midMergeKills = 0
      (0 until rounds).foreach { r =>
        val p = newChild(mName, stateRoot, opsDir)
        val out = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream))
        // kill on the first BATCH_START at-or-past the round's target batch,
        // after a jitter sweeping the merge window (incl. the commit tail)
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
                Thread.sleep(rnd.nextInt(1500).toLong)
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
        println(s"[drill] $mName round $r: killed=$killed started=$started done=$done")
      }
      // final, unkilled run must replay the whole log to completion
      val fin = newChild(mName, stateRoot, opsDir)
      val finOut = new java.io.BufferedReader(
        new java.io.InputStreamReader(fin.getInputStream))
      Iterator.continually(readLineSafe(finOut)).takeWhile(_ != null).foreach(_ => ())
      val finalExit = fin.waitFor()

      val truthRoot = newRoot(s"$mName-truth")
      m.oneShot(spark, opsDir, nBatches, truthRoot)
      val got = m.state(spark, stateRoot)
      val truth = m.state(spark, truthRoot)
      val matches = got == truth && truth.nonEmpty
      val lastBatch = graft.streaming.SnapshotStore.lastBatchId(m.gateRoot(stateRoot))
      val residue = m.stores(stateRoot)
        .flatMap(graft.streaming.SnapshotStore.orphanArtifacts).size +
        (if (mName == "ivf")
          graft.streaming.IncrementalIvf.orphanArtifacts(stateRoot).size
         else 0)
      val vacuous = midMergeKills < 1
      val ok = matches && !vacuous && finalExit == 0 &&
        lastBatch == nBatches - 1L && residue == 0
      allOk &&= ok
      results(mName) =
        s"""{"kills":$kills,"mid_merge_kills":$midMergeKills,""" +
          s""""final_exit":$finalExit,"rows":${got.size},"truth_rows":${truth.size},""" +
          s""""state_matches_truth":$matches,"last_batch_id":$lastBatch,""" +
          s""""residue":$residue,"vacuous":$vacuous,"ok":$ok}"""
      println(s"[drill] $mName: ok=$ok matches=$matches mid=$midMergeKills residue=$residue")
    }

    val totalMs = (System.nanoTime() - t0) / 1000000L
    val perM = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val committer = fsMode match {
      case "objsim" => "object-store committer (conditional-PUT commit objects on ObjStoreSimFs: atomic PUT, non-atomic copy+delete rename)"
      case "fileobj" => "object-store committer FORCED onto posix roots (spark.graft.snapshot.committer=object): commit objects published via the scheme-matched tmp + atomic exclusive rename, since a posix create is not atomic-at-close"
      case _ => "rename committer (staged exclusive rename, posix)"
    }
    val json = s"""{"metric":"driver_loss_drill","fs":"$fsMode","batches":$nBatches,""" +
      s""""rounds_per_maintainer":$rounds,"total_ms":$totalMs,""" +
      s""""maintainers":$perM,"all_ok":$allOk,""" +
      s""""method":"SIGKILL of the writer JVM at seeded-jitter offsets inside each maintainer's merge; cold JVM replay from batch 0 each round; gate = state equals the one-shot exact recompute, batch id recorded, zero staging/orphan residue; $committer"}"""
    val outName = fsMode match {
      case "objsim" => "DRILL_driver_loss_objsim.json"
      case "fileobj" => "DRILL_driver_loss_fileobj.json"
      case _ => "DRILL_driver_loss.json"
    }
    Files.write(Paths.get(outName), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
