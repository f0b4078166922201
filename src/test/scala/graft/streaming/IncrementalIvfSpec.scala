package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** IncrementalIvf: the frozen-quantizer assignment index maintained over
  * micro-batches equals the batch assignment of the same rows, under any
  * batch split, with replay a no-op; the live balance view equals the
  * s20 computation over the arrived set. The commit protocol is the
  * ledger-driven live set (fold dirs written at final `fold=<seq>.<uuid>`
  * names, one exclusive ledger publish, post-publish sweep): its crash
  * windows, the object-store run, and the legacy `_fold_v` staging
  * migration are all pinned here. */
class IncrementalIvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("incremental-ivf-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.hadoopConfiguration
      .set(ObjStoreSimFs.ImplConfKey, ObjStoreSimFs.ImplClass)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  // the frozen quantizer: the session-cached batch build's refined
  // centroids — what production pins between re-trains
  private lazy val cents =
    graft.analytics.Similarity.ivfCentroids(spark, dir).persist()

  private def batchAssign(rows: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    IncrementalIvf.deltas(rows, cents).as[(Long, Long)].collect().toSet
  }

  private def maintained(root: String): Set[(Long, Long)] = {
    import spark.implicits._
    IncrementalIvf.assignments(spark, root)
      .select(col("cid"), col("cent_id")).as[(Long, Long)].collect().toSet
  }

  private def arrivedSlices(n: Int): Seq[DataFrame] = {
    val all = emb.orderBy(col("vec_id")).collect()
    all.grouped(math.max(1, all.length / n)).toSeq.map(rows =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 2), emb.schema))
  }

  /** Data dirs of the assign layout: raw `batch=` deltas + `fold=` dirs. */
  private def dataDirNames(localAssign: String): Seq[String] =
    Option(new java.io.File(localAssign).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSeq
      .filter(n => n.startsWith("batch=") || n.startsWith("fold="))

  test("maintained assignments == batch assignment under a 3-way split; " +
      "replay is a no-op; balance view == s20 math over the arrived set") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf-state").toString
    val slices = arrivedSlices(3)
    slices.zipWithIndex.foreach { case (b, i) =>
      IncrementalIvf.merge(b, cents, i.toLong, root)
    }
    // replayed batch (crash between commit and ack): state unchanged
    val before = IncrementalIvf.assignments(spark, root).count()
    IncrementalIvf.merge(slices(1), cents, 1L, root)
    assert(IncrementalIvf.assignments(spark, root).count() == before)

    assert(maintained(root) == batchAssign(emb), "assignment parity broken")

    // balance view parity: same formula over the maintained counts
    val view = IncrementalIvf.balanceView(spark, root)
      .as[(Long, Long, Long)].collect().toSeq
    val counts = maintained(root).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val expect = counts.toSeq.sorted.map { case (c, n) =>
      (c, n, n * counts.size * 1000000L / total)
    }
    assert(view == expect)
    assert(view.map(_._2).sum == emb.count())
  }

  test("delta-dir compaction: the assign directory count stays bounded " +
      "across 6N batches (both tiers fire), assignments and replay unchanged") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "4")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-compact").toString
      val slices = arrivedSlices(24)
      val maxSeen = slices.zipWithIndex.map { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
        dataDirNames(s"$root/assign").size
      }.max
      // bound = maxDirs raw + maxDirs/4 tier-1 + slack; 24 batches at
      // maxDirs=4 cycle tier-0 folds ~7x and tier-1 merges ~2x
      assert(maxSeen <= 7, s"delta dirs accreted to $maxSeen across 24 batches")
      // no staging dirs ever (folds write at final names), no unlisted
      // fold garbage after the post-publish sweep, one (versioned) ledger
      val names = new java.io.File(s"$root/assign").listFiles().map(_.getName)
      assert(!names.exists(_.startsWith("_fold_v")))
      assert(names.count(_.startsWith("_folded_through")) == 1,
        "superseded ledger versions must be GCed after publish")
      assert(names.exists(_.matches("_folded_through\\.\\d+")),
        "ledger must publish under a versioned name (no delete-then-rename window)")
      assert(names.exists(_.startsWith("fold=")),
        "tier folds must land at final fold=<seq>.<uuid> names")
      assert(IncrementalIvf.orphanArtifacts(root).isEmpty)
      // the full maintained index equals the batch assignment of all rows
      assert(maintained(root) == batchAssign(emb), "compaction changed the index")
      // replaying a FOLDED batch must be a no-op: its delta dir is gone,
      // but the fold watermark proves its rows live in the folded dir —
      // rewriting the dir would double them
      val before = IncrementalIvf.assignments(spark, root).count()
      IncrementalIvf.merge(slices(0), cents, 0L, root)
      assert(IncrementalIvf.assignments(spark, root).count() == before)
      assert(maintained(root) == batchAssign(emb))
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("object-store root (objsim://): folds + ledger publishes run the " +
      "conditional-PUT path with NO rename on the commit path, index exact, " +
      "replay no-op, zero orphans after the final merge") {
    import scala.jdk.CollectionConverters._
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "4")
    try {
      val local = java.nio.file.Files.createTempDirectory("ivf-objsim").toString
      val root = s"objsim://$local"
      val slices = arrivedSlices(16)
      slices.zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      assert(maintained(root) == batchAssign(emb), "objsim index diverged")
      // replay of a folded batch stays a no-op on the object store
      val before = IncrementalIvf.assignments(spark, root).count()
      IncrementalIvf.merge(slices(0), cents, 0L, root)
      assert(IncrementalIvf.assignments(spark, root).count() == before)
      // folds happened, at final fold= names, with a single live ledger
      val names = new java.io.File(s"$local/assign").listFiles().map(_.getName)
      assert(names.exists(_.startsWith("fold=")), "no fold ran at maxDirs=4")
      assert(!names.exists(_.startsWith("_fold_v")))
      assert(names.count(n => n.startsWith("_folded_through") &&
        !n.endsWith(".tmp")) == 1)
      assert(IncrementalIvf.orphanArtifacts(root).isEmpty)
      // THE protocol claim: nothing on the commit path renames — no rename
      // ever targets a direct child of the assign dir (a staged fold dir
      // or ledger published by rename would), only parquet-job-internal
      // file moves inside a data dir
      val assignPath = s"$local/assign"
      val commitRenames = ObjStoreSimFs.renameLog.asScala.toSeq
        .filter(_.contains(assignPath))
        .map(_.split(" -> ")(1))
        .filter { dst =>
          val p = new org.apache.hadoop.fs.Path(dst)
          p.getParent != null && p.getParent.toUri.getPath == assignPath
        }
      assert(commitRenames.isEmpty,
        s"rename(s) on the commit path: ${commitRenames.mkString(", ")}")
      // cells snapshots rode the object committer (c=<N> commit objects)
      assert(new java.io.File(s"$local/cells").listFiles()
        .exists(_.getName.startsWith("c=")))
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("fold crash windows resolve from the ledger alone: an unlisted fold " +
      "dir is invisible garbage (pre-publish crash), a published fold with " +
      "originals still present never double-counts (pre-sweep crash), and " +
      "the next merge sweeps both") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100") // no auto-fold
    try {
      val local = java.nio.file.Files.createTempDirectory("ivf-crash").toString
      val root = s"objsim://$local"
      val slices = arrivedSlices(4)
      slices.zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      val truth = batchAssign(emb)
      // (a) crash BETWEEN fold write and ledger publish: a fold dir exists
      // at its final name but no ledger lists it — readers must not see it
      spark.read.parquet(s"$root/assign/batch=0", s"$root/assign/batch=1")
        .select(col("cid"), col("cent_id"))
        .write.parquet(s"$root/assign/fold=9.deadbeef")
      assert(maintained(root) == truth, "unlisted fold dir leaked into a read")
      assert(IncrementalIvf.orphanArtifacts(root) == Seq("fold=9.deadbeef"))
      IncrementalIvf.merge(slices(3), cents, 3L, root) // replay → sweep
      assert(!new java.io.File(s"$local/assign/fold=9.deadbeef").exists(),
        "pre-publish fold garbage must be swept by the next merge")
      assert(maintained(root) == truth)
      // (b) crash BETWEEN ledger publish and sweep: the fold is live and
      // the replaced originals still exist — the live-set read must count
      // each row exactly once (originals are ≤ through and unlisted)
      spark.read.parquet(s"$root/assign/batch=0", s"$root/assign/batch=1")
        .select(col("cid"), col("cent_id"))
        .write.parquet(s"$root/assign/fold=1.crashtest")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$local/assign/_folded_through.1"),
        "1\nfold=1.crashtest".getBytes)
      assert(maintained(root) == truth,
        "published fold + surviving originals double-counted")
      IncrementalIvf.merge(slices(3), cents, 3L, root) // replay → sweep
      assert(!new java.io.File(s"$local/assign/batch=0").exists() &&
        !new java.io.File(s"$local/assign/batch=1").exists(),
        "post-publish originals must be swept")
      assert(maintained(root) == truth)
      assert(IncrementalIvf.orphanArtifacts(root).isEmpty)
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("a torn raw delta (crash mid-parquet-job, no _SUCCESS) is invisible " +
      "to readers and repaired by its replay") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-torn").toString
      val slices = arrivedSlices(4)
      slices.take(3).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      val truth3 = batchAssign(slices.take(3).reduce(_ unionByName _))
      // manufacture the torn delta: real parquet rows, no job commit marker
      IncrementalIvf.deltas(slices(3), cents)
        .write.parquet(s"$root/assign/batch=3")
      assert(new java.io.File(s"$root/assign/batch=3/_SUCCESS").delete())
      assert(maintained(root) == truth3,
        "a torn raw delta leaked into the live set")
      // the replay repairs the dir (overwrite clears torn files) and the
      // index then includes the batch exactly once
      IncrementalIvf.merge(slices(3), cents, 3L, root)
      assert(maintained(root) == batchAssign(emb))
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("LEGACY MIGRATION — interrupted staged fold recovers " +
      "deterministically: a staged-but-unpublished _fold_v dir is " +
      "discarded, a published one is completed (the one surviving rename, " +
      "rename-atomic filesystems only by construction)") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100") // no auto-fold
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-recover").toString
      val slices = arrivedSlices(4)
      slices.zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      val truth = batchAssign(emb)
      // crash BEFORE publish: a staging dir without _SUCCESS — next merge
      // (replay of batch 3) must discard it and leave the index intact
      val preStage = new java.io.File(s"$root/assign/_fold_v1")
      assert(preStage.mkdirs())
      IncrementalIvf.merge(slices(3), cents, 3L, root)
      assert(!preStage.exists(), "unpublished staging dir must be discarded")
      assert(maintained(root) == truth)
      // crash AFTER publish, before the originals were deleted: staging
      // holds batches 0..1 with _SUCCESS + its _FOLDS record, and the
      // LEGACY ledger (bare-id fold list = batch=<id> naming) lists the
      // target as live — the next merge must complete the fold (delete
      // exactly the recorded originals, rename staging into place)
      spark.read.parquet(s"$root/assign/batch=0", s"$root/assign/batch=1")
        .select(col("cid"), col("cent_id"))
        .write.mode("overwrite").parquet(s"$root/assign/_fold_v1")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/assign/_fold_v1/_FOLDS"), "0 1".getBytes)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/assign/_folded_through"), "1\n1".getBytes)
      IncrementalIvf.merge(slices(3), cents, 3L, root) // replay triggers recovery
      val names = new java.io.File(s"$root/assign").listFiles().map(_.getName).toSet
      assert(!names.exists(_.startsWith("_fold_v")))
      assert(!names.contains("batch=0"), "folded original must be deleted")
      assert(names.contains("batch=1"), "fold target dir must exist")
      assert(maintained(root) == truth)
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("state root addressed through an explicit file:// URI — the Hadoop " +
      "FS metadata path (delta markers, fold ledger) has no raw-File fallback") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "4")
    try {
      val local = java.nio.file.Files.createTempDirectory("ivf-uri").toString
      val root = s"file://$local"
      val slices = arrivedSlices(8)
      slices.zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      }
      // compaction ran through the URI: bounded dirs + ledger on disk
      val names = new java.io.File(s"$local/assign").listFiles().map(_.getName)
      assert(dataDirNames(s"$local/assign").size <= 6)
      assert(names.exists(_.startsWith("_folded_through")))
      assert(maintained(root) == batchAssign(emb))
      // replay of a folded batch stays a no-op through the URI too
      val before = IncrementalIvf.assignments(spark, root).count()
      IncrementalIvf.merge(slices(0), cents, 0L, root)
      assert(IncrementalIvf.assignments(spark, root).count() == before)
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("tier-1 merge is not starved at degenerate maxDeltaDirs=2: fold dirs " +
      "stay bounded even though the raw count exceeds maxDirs on every batch") {
    // the IvfFoldLossDrill's first run caught this: with if/else-chained
    // tiers, raws sits at 3-4 (> maxDirs=2) on every merge while its
    // foldSet is too small to act, so the else-branch tier-1 merge NEVER
    // ran and fold dirs accreted one per two batches without bound
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "2")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-starve").toString
      val slices = arrivedSlices(16)
      val maxSeen = slices.zipWithIndex.map { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
        dataDirNames(s"$root/assign").size
      }.max
      // documented bound: maxDirs + max(2, maxDirs/4) + 2 = 6
      assert(maxSeen <= 6, s"delta dirs accreted to $maxSeen at maxDirs=2 — " +
        "tier-1 merge starved")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(IncrementalIvf.foldState(fs, root).folds.size <= 2)
      assert(maintained(root) == batchAssign(emb), "compaction changed the index")
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("ledger is never absent nor regressed across compaction cycles — " +
      "the fresh-name exclusive publish closes the delete-then-rename window") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "4")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-ledger").toString
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      var lastThrough = -1L
      var everFolded = false
      arrivedSlices(24).zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
        val st = IncrementalIvf.foldState(fs, root)
        assert(st.through >= lastThrough,
          s"fold watermark regressed at batch $i: $lastThrough -> ${st.through}")
        lastThrough = st.through
        if (st.through >= 0) everFolded = true
        if (everFolded) {
          val names = new java.io.File(s"$root/assign").listFiles().map(_.getName)
          assert(names.exists(_.startsWith("_folded_through")),
            s"ledger absent after batch $i despite a completed fold — " +
              "a crash here would reset foldedThrough to -1 and double-count replays")
        }
      }
      assert(everFolded, "test setup: 24 batches at maxDirs=4 must fold")
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("ledger read: stray .tmp ignored, highest seq wins, legacy bare name " +
      "parses as seq 0, bare-id fold tokens parse as legacy batch= dirs, " +
      "named tokens verbatim") {
    val root = java.nio.file.Files.createTempDirectory("ivf-ledger-read").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val assign = new java.io.File(s"$root/assign"); assert(assign.mkdirs())
    def put(name: String, body: String): Unit = java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/assign/$name"), body.getBytes)
    put("_folded_through", "3\n3")               // legacy = seq 0, bare id
    assert(IncrementalIvf.foldState(fs, root) ==
      IncrementalIvf.FoldState(3L, Seq("batch=3")))
    put("_folded_through.2", "5\n5")             // versioned wins over legacy
    assert(IncrementalIvf.foldState(fs, root).through == 5L)
    put("_folded_through.9.tmp", "99\n99")       // torn publish: ignored
    assert(IncrementalIvf.foldState(fs, root).through == 5L)
    put("_folded_through.10", "7\nfold=2.abc batch=4") // named + legacy mix
    assert(IncrementalIvf.foldState(fs, root) ==
      IncrementalIvf.FoldState(7L, Seq("batch=4", "fold=2.abc")))
  }

  test("LEGACY MIGRATION — read-only consumer completes a PUBLISHED staged " +
      "fold: crash between ledger publish and delta deletes, and crash " +
      "after deletes before the staging rename, both recover through " +
      "assignments() alone") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100") // no auto-fold
    try {
      val truth = batchAssign(emb)
      def setupPublishedFold(): String = {
        val root = java.nio.file.Files.createTempDirectory("ivf-ro").toString
        arrivedSlices(4).zipWithIndex.foreach { case (b, i) =>
          IncrementalIvf.merge(b, cents, i.toLong, root)
        }
        spark.read.parquet(s"$root/assign/batch=0", s"$root/assign/batch=1")
          .select(col("cid"), col("cent_id"))
          .write.mode("overwrite").parquet(s"$root/assign/_fold_v1")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$root/assign/_fold_v1/_FOLDS"), "0 1".getBytes)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$root/assign/_folded_through.1"), "1\n1".getBytes)
        root
      }
      // crash IMMEDIATELY after the ledger publish: originals intact
      val r1 = setupPublishedFold()
      assert(maintained(r1) == truth)
      val n1 = new java.io.File(s"$r1/assign").listFiles().map(_.getName).toSet
      assert(!n1.exists(_.startsWith("_fold_v")) && !n1.contains("batch=0") &&
        n1.contains("batch=1"))
      // crash MID-FINALIZE: originals already deleted, staging not renamed —
      // without read-side recovery this is the silently-shrunken index
      val r2 = setupPublishedFold()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$r2/assign/batch=0"))
      rm(new java.io.File(s"$r2/assign/batch=1"))
      assert(maintained(r2) == truth)
      // a read-only consumer must NOT GC an unpublished staging dir (it may
      // be a live legacy maintainer's in-flight fold)
      val pre = new java.io.File(s"$r2/assign/_fold_v9"); assert(pre.mkdirs())
      IncrementalIvf.assignments(spark, r2).count()
      assert(pre.exists(), "reader GCed an unpublished staging dir")
      IncrementalIvf.balanceView(spark, r2).count() // same read-only recovery path
      assert(pre.exists())
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("real streaming query over micro-batches == one-shot batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val ckp = java.nio.file.Files.createTempDirectory("ivf-ckp").toString
    val rows = emb.as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = IncrementalIvf.start(
      stream.toDS().toDF("vec_id", "embedding"), cents, root, ckp)
    val (h, t) = rows.splitAt(rows.size / 2)
    stream.addData(h)
    q.processAllAvailable()
    stream.addData(t)
    q.processAllAvailable()
    q.stop()
    assert(maintained(root) == batchAssign(emb))
  }
}
