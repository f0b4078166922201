package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of the IVF fold ledger — the twin of
  * SnapshotStoreObjectCommitterSpec's racing-writer test, on both legal
  * substrates (posix and the simulated object store):
  *
  *  1. two maintainers computing the SAME next ledger seq: the loser's
  *     exclusive publish surfaces [[SnapshotStore.ConcurrentWriterException]],
  *     the winner's ledger and fold dirs stay untouched, and the next merge
  *     sweeps the loser's orphan fold dir;
  *  2. the sweep-vs-unpublished-fold interleaving (a second maintainer's
  *     merge-start sweep deletes writer A's written-but-unpublished fold
  *     dir): A's publish must fail LOUDLY via publishFold's existence
  *     re-check instead of committing a ledger that lists a missing dir;
  *  3. a read-only consumer racing a live folding maintainer never reads a
  *     torn or shrunken index (livePaths' seq-stable read) — reads may fail
  *     loudly when lazy evaluation races the post-publish sweep (documented
  *     caveat), but a read that RETURNS must be a union of complete batches
  *     with no row dropped or doubled.
  */
class IvfLedgerRaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("ivf-ledger-race-spec")
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

  private def fsOf(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** posix root and objsim root for one scenario. */
  private def roots(tag: String): Seq[(String, String)] = {
    val posix = java.nio.file.Files.createTempDirectory(s"ivf-$tag").toString
    val obj = "objsim://" +
      java.nio.file.Files.createTempDirectory(s"ivf-$tag-obj").toString
    Seq("posix" -> posix, "objsim" -> obj)
  }

  /** Write a fold dir combining batches 0..1, at a final fold= name. */
  private def writeFoldDir(root: String, name: String): Unit =
    spark.read.parquet(s"$root/assign/batch=0", s"$root/assign/batch=1")
      .select(col("cid"), col("cent_id"))
      .write.parquet(s"$root/assign/$name")

  test("two maintainers race the same ledger seq: the loser fails loudly " +
      "with ConcurrentWriterException, the winner's ledger and fold dirs " +
      "are untouched, and the next merge sweeps the loser's orphan " +
      "(posix AND objsim)") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100") // no auto-fold
    try {
      val slices = arrivedSlices(4)
      val truth = batchAssign(emb)
      for ((kind, root) <- roots("race")) {
        slices.zipWithIndex.foreach { case (b, i) =>
          IncrementalIvf.merge(b, cents, i.toLong, root)
        }
        val fs = fsOf(root)
        // both writers computed next seq = 1 against the same (absent)
        // ledger and each wrote its own never-colliding fold dir
        val winnerDir = "fold=1.winner"
        val loserDir = "fold=1.loser"
        writeFoldDir(root, winnerDir)
        writeFoldDir(root, loserDir)
        // the winner's publish lands first
        IncrementalIvf.publishFold(fs, root,
          IncrementalIvf.FoldState(1L, Seq(winnerDir)), 1L, winnerDir)
        // the loser's exclusive publish of the SAME seq must lose LOUDLY —
        // conditional PUT on objsim, exclusive tmp+rename on posix — not
        // silently adopt a fold set it did not compute
        val e = intercept[SnapshotStore.ConcurrentWriterException] {
          IncrementalIvf.publishFold(fs, root,
            IncrementalIvf.FoldState(1L, Seq(loserDir)), 1L, loserDir)
        }
        assert(e.getMessage.contains("concurrent snapshot writer"), s"[$kind]")
        // winner's ledger survives verbatim; the index is exact (the
        // loser's orphan dir is unlisted garbage, batches 0-1 resolve
        // through the winner's fold)
        assert(IncrementalIvf.foldState(fs, root) ==
          IncrementalIvf.FoldState(1L, Seq(winnerDir)), s"[$kind]")
        assert(maintained(root) == truth, s"[$kind] index diverged after race")
        assert(IncrementalIvf.orphanArtifacts(root).contains(loserDir), s"[$kind]")
        // the next merge (a replay) sweeps the orphan fold dir and the
        // winner's now-folded originals
        IncrementalIvf.merge(slices(3), cents, 3L, root)
        assert(IncrementalIvf.orphanArtifacts(root).isEmpty, s"[$kind]")
        assert(maintained(root) == truth, s"[$kind]")
      }
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("sweep-vs-unpublished-fold interleaving: a second maintainer's " +
      "merge-start sweep deletes writer A's written-but-unpublished fold " +
      "dir — A's publish must fail LOUDLY (existence re-check), never " +
      "commit a ledger listing a missing dir (posix AND objsim)") {
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "100")
    try {
      val slices = arrivedSlices(4)
      val truth = batchAssign(emb)
      for ((kind, root) <- roots("sweep")) {
        slices.zipWithIndex.foreach { case (b, i) =>
          IncrementalIvf.merge(b, cents, i.toLong, root)
        }
        val fs = fsOf(root)
        val foldDir = "fold=1.victim"
        writeFoldDir(root, foldDir)
        // writer B's merge-start sweep: the fold dir is unlisted (A has not
        // published), so B deletes it as garbage — the ADVICE interleaving
        IncrementalIvf.sweepGarbage(fs, root)
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/assign/$foldDir")),
          s"[$kind] test setup: sweep must treat the unpublished dir as garbage")
        // A's publish would previously SUCCEED (no seq conflict) and commit
        // a ledger pointing at nothing — silent data loss. Now:
        val e = intercept[SnapshotStore.ConcurrentWriterException] {
          IncrementalIvf.publishFold(fs, root,
            IncrementalIvf.FoldState(1L, Seq(foldDir)), 1L, foldDir)
        }
        assert(e.getMessage.contains("vanished"), s"[$kind]")
        // nothing was published: no ledger exists, every raw stays live
        assert(IncrementalIvf.foldState(fs, root) ==
          IncrementalIvf.FoldState(-1L, Seq.empty), s"[$kind]")
        assert(maintained(root) == truth, s"[$kind]")
        assert(IncrementalIvf.orphanArtifacts(root).isEmpty, s"[$kind]")
      }
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }

  test("a read-only consumer racing a live folding maintainer: every read " +
      "that RETURNS is a union of complete batches — no row dropped, none " +
      "doubled (seq-stable livePaths); lazy-read-vs-sweep races fail " +
      "loudly and are retried, never silent") {
    // maxDirs=2 folds on nearly every merge — the densest publish+sweep
    // schedule the maintainer can produce
    spark.conf.set(IncrementalIvf.MaxDeltaDirsKey, "2")
    try {
      val root = java.nio.file.Files.createTempDirectory("ivf-rw-race").toString
      val slices = arrivedSlices(10)
      val batchSets: Seq[Set[(Long, Long)]] = slices.map(batchAssign)
      @volatile var done = false
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
      var reads = 0
      val reader = new Thread(() => {
        while (!done) {
          try {
            val rows = IncrementalIvf.assignments(spark, root).collect()
              .map(r => (r.getLong(0), r.getLong(1)))
            reads += 1
            if (rows.length != rows.distinct.length)
              failures.add(s"duplicated rows in a read of ${rows.length}")
            val got = rows.toSet
            batchSets.zipWithIndex.foreach { case (bs, i) =>
              val n = bs.count(got)
              if (n != 0 && n != bs.size)
                failures.add(s"torn batch $i: read $n of ${bs.size} rows")
            }
          } catch {
            // the documented lazy-read caveat: paths resolved by a
            // consistent livePaths can be swept before Spark materializes
            // them — such reads fail LOUDLY (never return partial data)
            // and a consumer retries; anything else is a real failure
            case t: Throwable =>
              def fnf(x: Throwable): Boolean = x != null && (
                x.isInstanceOf[java.io.FileNotFoundException] ||
                  Option(x.getMessage).exists(m =>
                    m.contains("FileNotFound") || m.contains("does not exist") ||
                      m.contains("Unable to infer schema")) ||
                  fnf(x.getCause))
              if (!fnf(t)) failures.add(s"read threw non-FNF: $t")
          }
        }
      })
      reader.start()
      try slices.zipWithIndex.foreach { case (b, i) =>
        IncrementalIvf.merge(b, cents, i.toLong, root)
      } finally { done = true; reader.join(60000) }
      assert(failures.isEmpty, s"inconsistent concurrent reads: " +
        failures.toArray.take(5).mkString("; "))
      assert(reads > 0, "reader never completed a read — test is vacuous")
      assert(maintained(root) == batchAssign(emb))
    } finally spark.conf.unset(IncrementalIvf.MaxDeltaDirsKey)
  }
}
