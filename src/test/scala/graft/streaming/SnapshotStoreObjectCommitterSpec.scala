package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The object-store commit protocol on the simulated object store
  * ([[ObjStoreSimFs]]): rename-free commit path, conditional-PUT commit
  * objects, crash/race behavior, retention bounds, and a maintainer
  * running end-to-end on an `objsim://` state root with bit-equal results
  * to the same merges on a posix root. The scheme gate's role here is
  * ADMISSION: `objsim` is listed with s3a/gs/abfs as non-atomic-rename,
  * and these writes pass with NO override flag — the override is only for
  * forcing the legacy rename committer onto such a scheme. */
class SnapshotStoreObjectCommitterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("snapshot-object-committer-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.hadoopConfiguration
      .set(ObjStoreSimFs.ImplConfKey, ObjStoreSimFs.ImplClass)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def fs(root: String) = new Path(root).getFileSystem(
    spark.sessionState.newHadoopConf())

  private def objRoot(): String =
    "objsim://" + Files.createTempDirectory("objstore").toString

  private def df(vals: Long*) = {
    import spark.implicits._
    vals.toDF("x")
  }

  private def kv(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def rootNames(root: String): Set[String] =
    fs(root).listStatus(new Path(root)).map(_.getPath.getName).toSet

  test("flat store round-trips on the simulated object store, no override " +
      "flag, with retention bounding commits and data dirs to 2") {
    val root = objRoot()
    SnapshotStore.writeNext(df(1L), root, Some(0L))
    SnapshotStore.writeNext(df(1L, 2L), root, Some(1L))
    SnapshotStore.writeNext(df(1L, 2L, 3L), root, Some(2L))
    assert(SnapshotStore.read(spark, root).get.count() === 3L)
    assert(SnapshotStore.lastBatchId(root) === 2L)
    assert(SnapshotStore.versions(root) === Seq(2L, 3L), "retention keeps top-2")
    val names = rootNames(root)
    assert(names.count(_.startsWith("c=")) === 2)
    assert(names.count(_.startsWith("d=")) === 2)
    assert(!names.exists(_.startsWith("v=")), "no version dirs in object layout")
    // crash-recovery fallback: the previous version is still readable if
    // the newest commit object is (hypothetically) lost
    fs(root).delete(new Path(root, "c=3"), false)
    assert(SnapshotStore.read(spark, root).get.count() === 2L)
    assert(SnapshotStore.lastBatchId(root) === 1L)
  }

  test("the commit path performs ZERO renames: data dirs are written in " +
      "place and the commit object is one conditional PUT") {
    val root = objRoot()
    ObjStoreSimFs.renameLog.clear()
    SnapshotStore.writeNext(df(1L, 2L), root, Some(0L))
    import scala.jdk.CollectionConverters._
    val renames = ObjStoreSimFs.renameLog.asScala.toSeq
      .filter(_.contains(root.stripPrefix("objsim://")))
    // the parquet job's internal task/job commits may rename INSIDE the
    // data dir (correctness-irrelevant: the dir is invisible until the
    // commit object lands) — but nothing may rename a commit object, a
    // data dir itself, or any _COMMIT-style marker
    assert(renames.forall(r => r.contains("/d=")),
      s"every rename must stay inside a data dir, got: $renames")
    assert(!renames.exists(_.contains("c=")), s"commit object was renamed: $renames")
    assert(!renames.exists(_.contains("_COMMIT")), s"marker rename: $renames")
  }

  test("a torn rename inside the data job cannot corrupt the store: the " +
      "previous commit stays current, and the next clean write recovers") {
    val root = objRoot()
    SnapshotStore.writeNext(df(1L, 2L), root, Some(0L))
    ObjStoreSimFs.armRenameFailure(afterObjects = 0) // first rename dies
    try intercept[Throwable] {
      SnapshotStore.writeNext(df(1L, 2L, 3L, 4L), root, Some(1L))
    } finally ObjStoreSimFs.disarmRenameFailure()
    assert(SnapshotStore.read(spark, root).get.count() === 2L,
      "reader must still see the last committed snapshot")
    assert(SnapshotStore.lastBatchId(root) === 0L)
    SnapshotStore.writeNext(df(1L, 2L, 3L, 4L), root, Some(1L))
    assert(SnapshotStore.read(spark, root).get.count() === 4L)
    // the torn write's orphan data dir was swept by the clean write
    assert(rootNames(root).count(_.startsWith("d=")) <= 2)
  }

  test("bucketed incremental writes: only touched buckets land in the new " +
      "data dir, untouched buckets resolve to the older dir by name") {
    val root = objRoot()
    val B = SnapshotStore.Buckets(Seq("k"), 8)
    val all = (0L until 16L).map(k => k -> s"v$k")
    SnapshotStore.writeNextBuckets(kv(all), root, Some(0L), B, None)
    val dirsAfterFull = rootNames(root).filter(_.startsWith("d="))
    // touch exactly one key's bucket
    val touched = SnapshotStore.bucketIds(kv(Seq(3L -> "")).select("k"), B)
    val updated = all.map { case (k, v) => k -> (if (k == 3L) "UPD" else v) }
    SnapshotStore.writeNextBuckets(kv(updated), root, Some(1L), B, Some(touched))
    val live = SnapshotStore.livePaths(root)
    val newDirs = rootNames(root).filter(_.startsWith("d=")) -- dirsAfterFull
    assert(newDirs.size === 1)
    val hostedInNew = live.count(p => p.contains(newDirs.head))
    val hostedInOld = live.count(p => dirsAfterFull.exists(p.contains))
    assert(hostedInNew === touched.size, "new dir hosts exactly the touched buckets")
    assert(hostedInOld === live.size - touched.size, "the rest stay in the old dir")
    // and the logical snapshot is whole and current
    val got = SnapshotStore.read(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === updated.toMap)
    // physical write volume: the new dir contains only the touched buckets
    val bucketDirs = fs(root).listStatus(new Path(root, newDirs.head))
      .filter(_.getPath.getName.startsWith(SnapshotStore.BucketCol + "="))
    assert(bucketDirs.length === touched.size)
  }

  test("bucketed: empty store keeps its schema; schema change under an " +
      "incremental write fails loudly") {
    val root = objRoot()
    val B = SnapshotStore.Buckets(Seq("k"), 8)
    SnapshotStore.writeNextBuckets(kv(Seq(1L -> "a")), root, Some(0L), B, None)
    // delete the only row — empty snapshot must still read with schema
    SnapshotStore.writeNextBuckets(kv(Seq.empty), root, Some(1L), B,
      Some(SnapshotStore.bucketIds(kv(Seq(1L -> "")).select("k"), B)))
    val cur = SnapshotStore.read(spark, root).get
    assert(cur.count() === 0L)
    assert(cur.columns.toSeq === Seq("k", "v"))
    // schema-changed incremental write is refused
    import spark.implicits._
    val widened = Seq((5L, "e", 9)).toDF("k", "v", "extra")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.writeNextBuckets(widened, root, Some(2L), B,
        Some(SnapshotStore.bucketIds(kv(Seq(5L -> "")).select("k"), B)))
    }
    assert(e.getMessage.contains("schema changed"))
  }

  test("a racing writer's commit object makes this writer fail loudly with " +
      "the winner's state untouched (monotonic guard + conditional PUT)") {
    val root = objRoot()
    SnapshotStore.writeNext(df(1L), root, Some(0L)) // c=1
    // both writers computed next=2 against base c=1; the racer's commit
    // object lands first (a valid one, pointing at its real data dir)
    val f = fs(root)
    df(7L, 8L).write.parquet(s"$root/d=2.racer")
    val out = f.create(new Path(root, "c=2"), false)
    out.write("1\nflat\nd=2.racer".getBytes("UTF-8")); out.close()
    // our writer's publish of ITS v=2 must fail loudly, not overwrite —
    // the monotonic guard catches it pre-PUT, and had it slipped past,
    // the conditional PUT itself arbitrates (ObjStoreSimFsSpec proves
    // that layer has exactly-one-winner semantics)
    df(1L, 2L).write.parquet(s"$root/d=2.ours")
    val e = intercept[SnapshotStore.ConcurrentWriterException] {
      SnapshotStore.ObjMode.publishCommit(f, root, 2L,
        SnapshotStore.ObjMode.ObjCommit(1L, Some("d=2.ours"), None))
    }
    assert(e.getMessage.contains("concurrent snapshot writer"))
    assert(SnapshotStore.read(spark, root).get.collect().map(_.getLong(0)).sorted
      === Array(7L, 8L), "the racer's committed snapshot must survive")
    assert(SnapshotStore.lastBatchId(root) === 1L)
    // the loser's orphan data dir is swept by the next successful write
    SnapshotStore.writeNext(df(9L), root, Some(2L))
    assert(!rootNames(root).contains("d=2.ours"))
    assert(SnapshotStore.read(spark, root).get.collect().map(_.getLong(0)).toSeq
      === Seq(9L))
  }

  test("layouts do not mix: forcing the other committer onto an existing " +
      "root is refused; auto mode follows the existing layout") {
    // rename-layout local root refuses a forced object committer
    val localRoot = Files.createTempDirectory("mix1").toString
    SnapshotStore.writeNext(df(1L), localRoot, Some(0L))
    spark.conf.set(SnapshotStore.CommitterConfKey, "object")
    try {
      val e = intercept[IllegalStateException] {
        SnapshotStore.writeNext(df(1L, 2L), localRoot, Some(1L))
      }
      assert(e.getMessage.contains("cannot be mixed"))
    } finally spark.conf.unset(SnapshotStore.CommitterConfKey)
    // object-layout root (local disk, forced object) then written with NO
    // conf: auto mode follows the object layout
    val objOnLocal = Files.createTempDirectory("mix2").toString
    spark.conf.set(SnapshotStore.CommitterConfKey, "object")
    try SnapshotStore.writeNext(df(1L), objOnLocal, Some(0L))
    finally spark.conf.unset(SnapshotStore.CommitterConfKey)
    SnapshotStore.writeNext(df(1L, 2L), objOnLocal, Some(1L)) // follows layout
    assert(SnapshotStore.read(spark, objOnLocal).get.count() === 2L)
    assert(rootNames(objOnLocal).exists(_.startsWith("c=")))
    // ...and refuses a forced rename committer
    spark.conf.set(SnapshotStore.CommitterConfKey, "rename")
    try {
      val e2 = intercept[IllegalStateException] {
        SnapshotStore.writeNext(df(1L, 2L, 3L), objOnLocal, Some(2L))
      }
      assert(e2.getMessage.contains("cannot be mixed"))
    } finally spark.conf.unset(SnapshotStore.CommitterConfKey)
  }

  test("readTouched on an object-layout root scans ONLY the touched " +
      "buckets' dirs — the MERGE-INTO read prune holds under the object " +
      "committer too") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val root = objRoot()
    val B = SnapshotStore.Buckets(Seq("k"), 8)
    val all = (0L until 80L).map(k => k -> s"v$k")
    SnapshotStore.writeNextBuckets(kv(all), root, Some(0L), B, None)
    val tb = SnapshotStore.bucketIds(kv(Seq(3L -> "")).select("k"), B)
    assert(tb.size == 1)
    val pruned = SnapshotStore.readTouched(spark, root, B, tb).get
    val scans = pruned.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    // physical: exactly the touched buckets' dirs, resolved through the
    // commit object's by-name dir map
    assert(scans.nonEmpty && scans.forall(p =>
      tb.exists(b => p.endsWith(s"${SnapshotStore.BucketCol}=$b")) &&
        p.contains("/d=")),
      s"prune leaked beyond the touched buckets: $scans")
    // logical: key 3 plus its bucket cohabitants, nobody else
    val expectKeys = kv(all)
      .filter(pmod(hash(col("k")), lit(B.num)).isin(tb.toSeq.map(Int.box): _*))
      .collect().map(_.getLong(0)).toSet
    assert(pruned.collect().map(_.getLong(0)).toSet === expectKeys)
    assert(expectKeys(3L) && expectKeys.size < all.size)
  }

  test("orphanDataDirs flags exactly the data dirs no kept commit " +
      "references, and a clean write sweeps them") {
    val root = objRoot()
    SnapshotStore.writeNext(df(1L), root, Some(0L))
    assert(SnapshotStore.orphanArtifacts(root).isEmpty)
    // a dead writer's never-committed output
    df(9L, 9L).write.parquet(s"$root/d=9.dead-writer")
    assert(SnapshotStore.orphanArtifacts(root) === Seq("d=9.dead-writer"))
    // readers never see it
    assert(SnapshotStore.read(spark, root).get.collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    SnapshotStore.writeNext(df(1L, 2L), root, Some(1L))
    assert(SnapshotStore.orphanArtifacts(root).isEmpty,
      "the next successful write's retention must sweep the orphan")
    assert(!rootNames(root).contains("d=9.dead-writer"))
  }

  test("the real streaming path (writeStream.foreachBatch) maintains an " +
      "objsim state root — checkpoint on posix, state on the object store") {
    import spark.implicits._
    val root = objRoot()
    val dir = Files.createTempDirectory("objstream")
    val b0 = Seq(
      ("i", 1L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double],
        "g0", java.lang.Double.valueOf(1.5)),
      ("i", 2L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double],
        "g1", java.lang.Double.valueOf(2.5)))
      .toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
    val b1 = Seq(
      ("u", 1L, "g0", java.lang.Double.valueOf(1.5), "g1",
        java.lang.Double.valueOf(4.0)),
      ("d", 2L, "g1", java.lang.Double.valueOf(2.5),
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
      .toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
    b0.write.parquet(s"$dir/f0")
    b1.write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val q = IncrementalAgg.start(stream, root,
      Files.createTempDirectory("objstreamC").toString)
    q.processAllAvailable()
    q.stop()
    val got = IncrementalAgg.read(spark, root).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).toPlainString))
      .toMap
    assert(got.keySet === Set("g1"))
    assert(got("g1")._1 === 1L)
    assert(BigDecimal(got("g1")._2) === BigDecimal("4.0"))
    assert(rootNames(root).exists(_.startsWith("c=")), "object layout expected")
  }

  test("IncrementalAgg runs end-to-end on an objsim state root, bit-equal " +
      "to the same merges on a posix root, with replay skipped") {
    import spark.implicits._
    def ops(b: Int) = Seq(
      ("i", b * 10L + 1, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double],
        s"g${b % 2}", java.lang.Double.valueOf(b + 0.5)),
      ("i", b * 10L + 2, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double],
        "g0", java.lang.Double.valueOf(1.25)))
      .toDF("op", "id", "grp_old", "amount_old", "grp_new", "amount_new")
    val obj = objRoot()
    val posix = Files.createTempDirectory("agg-posix").toString
    (0 until 4).foreach { b =>
      IncrementalAgg.merge(ops(b), b.toLong, obj)
      IncrementalAgg.merge(ops(b), b.toLong, posix)
    }
    IncrementalAgg.merge(ops(2), 2L, obj) // replayed batch: must be skipped
    def state(root: String) = IncrementalAgg.read(spark, root).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).toPlainString))
      .toMap
    assert(state(obj) === state(posix))
    assert(SnapshotStore.lastBatchId(obj) === 3L)
  }

  test("FORCED-POSIX object root: a torn c=<N> at its final name (the " +
      "legacy pre-scheme-matched-publish crash shape) is skipped by " +
      "readers, flagged as an orphan, and swept by the next clean write") {
    import java.nio.file.Paths
    val root = Files.createTempDirectory("torncommit").toString
    spark.conf.set(SnapshotStore.CommitterConfKey, "object")
    try {
      SnapshotStore.writeNext(df(1L), root, Some(0L)) // c=1
      SnapshotStore.writeNext(df(1L, 2L), root, Some(1L)) // c=2
      // the shape a SIGKILL between create and close used to leave when the
      // commit object was published by bare create-at-final-name: empty
      Files.write(Paths.get(root, "c=3"), Array.emptyByteArray)
      assert(SnapshotStore.read(spark, root).get.count() === 2L,
        "a torn commit object must not strand the store unreadable")
      assert(SnapshotStore.lastBatchId(root) === 1L)
      assert(SnapshotStore.orphanArtifacts(root).contains("c=3"))
      // killed mid-write (partial content) is equally skipped
      Files.write(Paths.get(root, "c=3"), "2\nfl".getBytes)
      assert(SnapshotStore.read(spark, root).get.count() === 2L)
      assert(SnapshotStore.lastBatchId(root) === 1L)
      // a clean write commits PAST the torn name (name-monotonic, so the
      // version number is never reused while the torn file exists) and its
      // retention sweeps the torn file
      SnapshotStore.writeNext(df(1L, 2L, 3L), root, Some(2L)) // c=4
      assert(SnapshotStore.read(spark, root).get.count() === 3L)
      assert(SnapshotStore.lastBatchId(root) === 2L)
      assert(!rootNames(root).contains("c=3"),
        "retention must sweep the torn commit file")
      assert(SnapshotStore.orphanArtifacts(root).isEmpty)
    } finally spark.conf.unset(SnapshotStore.CommitterConfKey)
  }

  test("FORCED-POSIX object root, fault-injected kill between the commit " +
      "object's create and close: the publish is scheme-matched " +
      "(tmp + exclusive rename), so the final c=<N> name is NEVER touched " +
      "— readers resolve the previous commit and the retry recovers") {
    spark.sparkContext.hadoopConfiguration
      .set(FaultyCommitLocalFs.ImplConfKey, FaultyCommitLocalFs.ImplClass)
    spark.sparkContext.hadoopConfiguration
      .set(FaultyCommitLocalFs.AbstractImplConfKey,
        FaultyCommitLocalFs.AbstractImplClass)
    val local = Files.createTempDirectory("faultposix").toString
    val root = s"${FaultyCommitLocalFs.Scheme}://$local"
    spark.conf.set(SnapshotStore.CommitterConfKey, "object")
    // the scheme is neither posix-whitelisted nor capability-advertising,
    // so the exclusive-create gate needs the acknowledgment conf — the
    // commit publish itself then routes through the POSIX (tmp+rename)
    // primitive because the scheme is not an object scheme
    spark.conf.set(SnapshotStore.AssumeConditionalCreateKey, "true")
    try {
      SnapshotStore.writeNext(df(1L), root, Some(0L)) // c=1
      SnapshotStore.writeNext(df(1L, 2L), root, Some(1L)) // c=2
      assert(SnapshotStore.read(spark, root).get.count() === 2L)
      FaultyCommitLocalFs.armed.set(true)
      try {
        val e = intercept[java.io.IOException] {
          SnapshotStore.writeNext(df(1L, 2L, 3L), root, Some(2L))
        }
        assert(e.getMessage.contains("injected kill"))
      } finally FaultyCommitLocalFs.armed.set(false)
      val names = rootNames(root)
      // THE fix under test: pre-fix, publishCommit created c=3 at its final
      // name and died mid-write — a torn commit object. Now the only
      // artifact a kill in that window can leave is the tmp sibling.
      assert(!names.contains("c=3"),
        s"final commit name was created before its content was durable: $names")
      assert(names.contains("c=3.tmp"))
      assert(SnapshotStore.read(spark, root).get.count() === 2L,
        "readers must resolve the previous commit")
      assert(SnapshotStore.lastBatchId(root) === 1L)
      assert(SnapshotStore.orphanArtifacts(root).contains("c=3.tmp"))
      // the re-run merge (same batch) publishes cleanly over the stray tmp
      SnapshotStore.writeNext(df(1L, 2L, 3L), root, Some(2L)) // c=3
      assert(SnapshotStore.read(spark, root).get.count() === 3L)
      assert(SnapshotStore.lastBatchId(root) === 2L)
      assert(!rootNames(root).exists(_.endsWith(".tmp")),
        "the stray publish tmp must be gone after a clean publish")
      assert(SnapshotStore.orphanArtifacts(root).isEmpty)
    } finally {
      spark.conf.unset(SnapshotStore.CommitterConfKey)
      spark.conf.unset(SnapshotStore.AssumeConditionalCreateKey)
    }
  }

  test("PINNED FAILURE SHAPE of the acknowledged weak create: on the " +
      "check-then-act FileSystem two racing commit publishes BOTH succeed " +
      "(silent lost update — the window assumeConditionalCreate waives); " +
      "the true arbiter turns the same interleaving into a LOUD loss") {
    spark.sparkContext.hadoopConfiguration
      .set(ObjStoreSimFs.WeakImplConfKey, ObjStoreSimFs.WeakImplClass)
    def contentOf(fsRoot: String, name: String): String = {
      val f = fs(fsRoot)
      val p = new Path(fsRoot, name)
      val len = f.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8")
    }
    val aBytes = "0\nflat\nd=1.a".getBytes("UTF-8")
    val bBytes = "1\nflat\nd=1.b".getBytes("UTF-8")
    // strong arbiter (objsim, the If-None-Match model): writers A and B
    // both pass the exists() pre-check (B opened its PUT first), A's PUT
    // completes, B's close — the arbiter — fails loudly; A's commit object
    // survives byte-for-byte. This is publishCommit's primitive on object
    // schemes ([[SnapshotStore.createExclusive]]).
    val sRoot = objRoot()
    val fsS = fs(sRoot)
    fsS.mkdirs(new Path(sRoot))
    val sB = fsS.create(new Path(sRoot, "c=1"), false)
    sB.write(bBytes)
    val sA = fsS.create(new Path(sRoot, "c=1"), false)
    sA.write(aBytes)
    sA.close()
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { sB.close() }
    assert(contentOf(sRoot, "c=1") === new String(aBytes, "UTF-8"),
      "the arbiter must preserve the first committed object")
    // weak create (classic-S3A shape, admitted only via the conf): the SAME
    // interleaving has no arbiter — both closes succeed and B's PUT
    // silently replaces A's already-committed object. Writer A believes its
    // batch committed; its commit is gone. This spec makes the waiver's
    // cost concrete: the conf does not narrow this window, it accepts it.
    val wRoot = "objweak://" + Files.createTempDirectory("objweak-race")
    val fsW = fs(wRoot)
    fsW.mkdirs(new Path(wRoot))
    val wB = fsW.create(new Path(wRoot, "c=1"), false)
    wB.write(bBytes)
    val wA = fsW.create(new Path(wRoot, "c=1"), false)
    wA.write(aBytes)
    wA.close() // "committed", as far as writer A can tell
    wB.close() // no arbiter: silently replaces A
    assert(contentOf(wRoot, "c=1") === new String(bBytes, "UTF-8"),
      "documented lost-update shape: the later PUT wins with no error")
  }

  test("conditional-create capability gate: a FileSystem whose exclusive " +
      "create is check-then-act (WeakCreateSimFs — the classic-S3A shape) " +
      "is REFUSED at store open; the acknowledgment conf proceeds; objsim " +
      "(true If-None-Match arbiter) passes by advertised capability") {
    spark.sparkContext.hadoopConfiguration
      .set(ObjStoreSimFs.WeakImplConfKey, ObjStoreSimFs.WeakImplClass)
    // objsim advertises the capability — the gate passes with no conf
    SnapshotStore.requireExclusiveCreate(objRoot())
    val weakRoot = "objweak://" + Files.createTempDirectory("objweak").toString
    // the committer selection still routes the weak scheme to the object
    // committer (it IS an object store — rename is worse)...
    assert(SnapshotStore.committerFor(weakRoot) == "object")
    // ...but the capability gate refuses the write before any mutation,
    // naming the requirement and the acknowledgment conf
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.writeNext(df(1L), weakRoot, Some(0L))
    }
    assert(e.getMessage.contains("exclusive-create"))
    assert(e.getMessage.contains("If-None-Match"))
    assert(e.getMessage.contains(SnapshotStore.AssumeConditionalCreateKey))
    assert(!rootNames(weakRoot).exists(_.startsWith("c=")), "refusal must precede writes")
    // the IVF maintainer's ledger publish shares the same gate
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val eIvf = intercept[IllegalArgumentException] {
      IncrementalIvf.merge(vecs, vecs, 0L, s"$weakRoot/ivf")
    }
    assert(eIvf.getMessage.contains(SnapshotStore.AssumeConditionalCreateKey))
    // the documented acknowledgment: deployment asserts its store DOES
    // provide conditional create even though the connector does not
    // advertise it — the write then proceeds and round-trips
    spark.conf.set(SnapshotStore.AssumeConditionalCreateKey, "true")
    try {
      SnapshotStore.writeNext(df(1L), weakRoot, Some(0L))
      SnapshotStore.writeNext(df(1L, 2L), weakRoot, Some(1L))
      assert(SnapshotStore.read(spark, weakRoot).get.count() === 2L)
      assert(SnapshotStore.lastBatchId(weakRoot) === 1L)
    } finally spark.conf.unset(SnapshotStore.AssumeConditionalCreateKey)
  }
}
