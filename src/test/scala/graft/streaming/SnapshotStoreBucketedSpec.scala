package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The bucketed SnapshotStore: per-batch writes materialize ONLY the
  * touched buckets (the MERGE-INTO write shape), the manifest carries
  * untouched buckets forward, the `_COMMIT` crash window is unchanged,
  * and retention keeps exactly the versions/buckets the two newest
  * manifests still reference. */
class SnapshotStoreBucketedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("snapshot-bucketed-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val B = SnapshotStore.Buckets(Seq("k"), 8)

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def state(root: String): Map[Long, String] =
    SnapshotStore.read(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Data bytes inside one version dir (parquet part files only). */
  private def dataBytes(root: String, v: Long): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.startsWith("part-")) f.length()
      else 0L
    walk(new java.io.File(s"$root/v=$v"))
  }

  private def bucketDirs(root: String, v: Long): Set[Int] =
    Option(new java.io.File(s"$root/v=$v").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"${SnapshotStore.BucketCol}="))
      .map(_.getName.stripPrefix(s"${SnapshotStore.BucketCol}=").toInt).toSet

  test("write amplification: bytes written per batch ∝ touched buckets, " +
      "and the merged view stays exact across incremental writes") {
    val root = Files.createTempDirectory("bucketed").toString
    val full = (0L until 400L).map(k => k -> s"v$k")
    // batch 0: everything (first write = full rewrite by construction)
    SnapshotStore.writeNextBucketed(df(full), root, Some(0L), B, None)
    assert(state(root) == full.toMap)
    assert(bucketDirs(root, 1L) == (0 until B.num).toSet,
      "400 keys over 8 buckets must populate every bucket")
    val fullBytes = dataBytes(root, 1L)

    // batch 1: touch ONE key — the whole state frame is passed (untouched
    // rows unioned through, as every maintainer's merge plan does), but
    // only the touched key's bucket may be physically written
    val touched1 = df(Seq(7L -> "")).select("k")
    val after1 = full.toMap + (7L -> "V7")
    SnapshotStore.writeNextBucketed(
      df(after1.toSeq), root, Some(1L), B, Some(touched1))
    assert(state(root) == after1)
    val written1 = bucketDirs(root, 2L)
    assert(written1.size == 1, s"one touched key must write one bucket, got $written1")
    val incrBytes = dataBytes(root, 2L)
    assert(incrBytes * 4 < fullBytes,
      s"write amplification: incremental batch wrote $incrBytes bytes vs " +
        s"full snapshot $fullBytes — expected ≲ 1/${B.num} of the state")

    // batch 2: delete every key in one bucket — the bucket must leave the
    // manifest (and the view) even though it produced no output rows
    val victimBucket = written1.head
    val bexpr = pmod(hash(col("k")), lit(B.num))
    val survivors = df(after1.toSeq).filter(bexpr =!= victimBucket)
    val victims = df(after1.toSeq).filter(bexpr === victimBucket).select("k")
    SnapshotStore.writeNextBucketed(survivors, root, Some(2L), B, Some(victims))
    val expect2 = survivors.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(root) == expect2)
    assert(!state(root).contains(7L))
  }

  test("crash window: an uncommitted bucketed version (manifest and all) is " +
      "invisible; readers fall back to the previous manifest") {
    val root = Files.createTempDirectory("bucketed-crash").toString
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "a", 2L -> "b")), root, Some(0L), B, None)
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "A", 2L -> "b")), root, Some(1L),
      B, Some(df(Seq(1L -> "")).select("k")))
    assert(state(root) == Map(1L -> "A", 2L -> "b"))
    // simulate the crash: v=2's parquet job + manifest landed, _COMMIT did not
    val commit = new java.io.File(s"$root/v=2/_COMMIT")
    assert(commit.delete())
    assert(new java.io.File(s"$root/v=2/_MANIFEST").isFile,
      "test setup: the uncommitted version must still carry its manifest")
    assert(state(root) == Map(1L -> "a", 2L -> "b"),
      "reader surfaced an uncommitted bucketed version")
    assert(SnapshotStore.lastBatchId(root) == 0L)
    // the replayed batch re-merges onto the fallback and commits as v=3
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "A", 2L -> "b")), root, Some(1L),
      B, Some(df(Seq(1L -> "")).select("k")))
    assert(state(root) == Map(1L -> "A", 2L -> "b"))
    assert(SnapshotStore.lastBatchId(root) == 1L)
  }

  test("retention: versions referenced by the two newest manifests survive, " +
      "older versions and superseded bucket dirs are pruned") {
    val root = Files.createTempDirectory("bucketed-retain").toString
    val keys = (0L until 80L)
    SnapshotStore.writeNextBucketed(
      df(keys.map(k => k -> "x")), root, Some(0L), B, None)
    // ten batches, each touching the same single key: its bucket gets a new
    // dir every version; every OTHER bucket must keep resolving to v=1
    (1 to 10).foreach { i =>
      SnapshotStore.writeNextBucketed(
        df(keys.map(k => k -> (if (k == 3L) s"x$i" else "x"))),
        root, Some(i.toLong), B, Some(df(Seq(3L -> "")).select("k")))
    }
    assert(state(root)(3L) == "x10")
    assert(state(root)(4L) == "x")
    val surviving = SnapshotStore.versionDirs(root).map(_._1).toSet
    // v=1 must survive (hosts the 7 untouched buckets); the intermediate
    // single-bucket versions v=2..v=9 are unreferenced by the two newest
    // manifests and must be gone
    assert(surviving(1L), "v=1 still hosts untouched buckets — must survive")
    assert(!surviving.exists(v => v >= 2L && v <= 9L),
      s"superseded single-bucket versions not pruned: $surviving")
    assert(surviving(10L) && surviving(11L))
    // and the store stays bounded: live data + the fallback copy
    val totalDirs = surviving.size
    assert(totalDirs <= 3, s"unbounded version accretion: $surviving")
  }

  test("bucket-count change forces one full rewrite, then incremental resumes") {
    val root = Files.createTempDirectory("bucketed-resize").toString
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "a", 2L -> "b")), root, Some(0L), B, None)
    val wider = SnapshotStore.Buckets(Seq("k"), 16)
    // touched says "key 1 only" but the layout changed — the store must
    // ignore the hint and rewrite everything under the new bucket count
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "A", 2L -> "b")), root, Some(1L),
      wider, Some(df(Seq(1L -> "")).select("k")))
    assert(state(root) == Map(1L -> "A", 2L -> "b"))
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "A", 2L -> "B")), root, Some(2L),
      wider, Some(df(Seq(2L -> "")).select("k")))
    assert(state(root) == Map(1L -> "A", 2L -> "B"))
  }

  test("flat → bucketed migration: first bucketed write over a flat store " +
      "full-rewrites, reads stay whole throughout") {
    val root = Files.createTempDirectory("bucketed-migrate").toString
    SnapshotStore.writeNext(df(Seq(1L -> "a", 2L -> "b")), root, Some(0L))
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "A", 2L -> "b")), root, Some(1L),
      B, Some(df(Seq(1L -> "")).select("k")))
    assert(state(root) == Map(1L -> "A", 2L -> "b"))
    assert(bucketDirs(root, 2L).nonEmpty)
    // and flat writeNext atop a bucketed store must not strand readers
    SnapshotStore.writeNext(df(Seq(9L -> "z")), root, Some(2L))
    assert(state(root) == Map(9L -> "z"))
  }

  test("readTouched scans ONLY the touched buckets' dirs (the MERGE INTO " +
      "read prune); a flat store falls back to the full read") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val root = Files.createTempDirectory("bucketed-prune").toString
    val all = (0L until 80L).map(k => k -> s"v$k")
    SnapshotStore.writeNextBucketed(df(all), root, Some(0L), B, None)
    val tb = SnapshotStore.bucketIds(df(Seq(3L -> "")).select("k"), B)
    assert(tb.size == 1)
    val pruned = SnapshotStore.readTouched(spark, root, B, tb).get
    // physical: the scan's root paths are exactly the touched bucket dirs
    val scans = pruned.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    val expectDirs = tb.map(b => s"$root/v=1/${SnapshotStore.BucketCol}=$b")
    assert(scans.nonEmpty && scans.forall(p => expectDirs.exists(p.endsWith)),
      s"prune leaked beyond the touched buckets: $scans")
    // logical: exactly the keys that hash into the touched bucket — key 3
    // plus its cohabitants, nobody else
    val expectKeys = df(all)
      .filter(pmod(hash(col("k")), lit(B.num)).isin(tb.toSeq.map(Int.box): _*))
      .collect().map(_.getLong(0)).toSet
    assert(pruned.collect().map(_.getLong(0)).toSet == expectKeys)
    assert(expectKeys(3L) && expectKeys.size < all.size)
    // flat store: no manifest to prune with — full read, never silent loss
    val flat = Files.createTempDirectory("bucketed-prune-flat").toString
    SnapshotStore.writeNext(df(Seq(1L -> "a", 2L -> "b")), flat, Some(0L))
    val full = SnapshotStore.readTouched(spark, flat, B, tb).get
    assert(full.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("store addressed through an explicit file:// URI — the Hadoop " +
      "FileSystem metadata path, no raw java.io.File fallback") {
    // every metadata op (version listing, manifest, _COMMIT, retention)
    // must resolve through the Hadoop FS API: a raw java.io.File would
    // treat "file:/..." as a literal relative path and break immediately
    val local = Files.createTempDirectory("bucketed-uri").toString
    val root = s"file://$local"
    val full = (0L until 100L).map(k => k -> s"v$k")
    SnapshotStore.writeNextBucketed(df(full), root, Some(0L), B, None)
    assert(state(root) == full.toMap)
    // incremental write + manifest-carried untouched buckets
    val after = full.toMap + (7L -> "V7")
    SnapshotStore.writeNextBucketed(df(after.toSeq), root, Some(1L),
      B, Some(df(Seq(7L -> "")).select("k")))
    assert(state(root) == after)
    assert(SnapshotStore.lastBatchId(root) == 1L)
    assert(SnapshotStore.versions(root) == Seq(1L, 2L))
    // the physical layout landed under the local path (not a ./file:... dir)
    assert(new java.io.File(s"$local/v=2/_MANIFEST").isFile)
    assert(new java.io.File(s"$local/v=2/_COMMIT").isFile)
    // read prune + retention still work through the URI
    val tb = SnapshotStore.bucketIds(df(Seq(7L -> "")).select("k"), B)
    val pruned = SnapshotStore.readTouched(spark, root, B, tb).get
    assert(pruned.collect().map(_.getLong(0)).toSet.contains(7L))
    (2 to 5).foreach { i =>
      SnapshotStore.writeNextBucketed(df(after.toSeq), root, Some(i.toLong),
        B, Some(df(Seq(7L -> "")).select("k")))
    }
    assert(SnapshotStore.versionDirs(root).size <= 3,
      "retention must prune through the Hadoop FS API too")
    assert(state(root) == after)
  }

  test("schema change under an incremental bucketed write fails fast " +
      "(a migration needs one explicit full rewrite)") {
    import spark.implicits._
    val root = Files.createTempDirectory("bucketed-schema").toString
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "a", 2L -> "b")), root, Some(0L), B, None)
    val widened = Seq((1L, "A", 9L), (2L, "b", 8L)).toDF("k", "v", "extra")
    // incremental write with a NEW schema: must refuse loudly — a silent
    // full rewrite could drop untouched buckets if the caller's frame was
    // built from a pruned readTouched
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.writeNextBucketed(widened, root, Some(1L),
        B, Some(df(Seq(1L -> "")).select("k")))
    }
    assert(e.getMessage.contains("schema changed"))
    // the store is untouched by the refused write
    assert(state(root) == Map(1L -> "a", 2L -> "b"))
    // the documented migration path: same schema change with
    // touchedKeys=None full-rewrites and succeeds
    SnapshotStore.writeNextBucketed(widened, root, Some(1L), B, None)
    val cur = SnapshotStore.read(spark, root).get
    assert(cur.columns.toSet == Set("k", "v", "extra"))
    assert(cur.count() == 2L)
    // and incremental writes resume under the new schema
    val widened2 = Seq((1L, "A", 9L), (2L, "B", 8L)).toDF("k", "v", "extra")
    SnapshotStore.writeNextBucketed(widened2, root, Some(2L),
      B, Some(df(Seq(2L -> "")).select("k")))
    assert(SnapshotStore.read(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "A", 2L -> "B"))
  }

  test("retention deletion guard: a victim outside the store root is refused") {
    val root = Files.createTempDirectory("bucketed-guard").toString
    val outside = Files.createTempDirectory("bucketed-guard-outside")
    val victim = outside.resolve("precious")
    Files.createDirectories(victim)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.deleteUnder(fs, new org.apache.hadoop.fs.Path(root),
        new org.apache.hadoop.fs.Path(victim.toString))
    }
    assert(e.getMessage.contains("refusing to delete"))
    assert(Files.isDirectory(victim), "guard must not have deleted the victim")
    // and a hand-corrupted manifest version cannot steer retention outside
    // the root either: hosting versions are parsed as longs (traversal
    // strings never parse) and unresolvable versions match no dir
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "a")), root, Some(0L), B, None)
    val manPath = new org.apache.hadoop.fs.Path(s"$root/v=1/_MANIFEST")
    // corrupt THROUGH the fs API (the local FS keeps checksum sidecars)
    val in = fs.open(manPath)
    val lines = scala.io.Source.fromInputStream(in).mkString.split("\n").toSeq
    in.close()
    val corrupted = (lines.take(3) ++
      lines.drop(3).map(l => l.split(" ")(0) + " 999999999")).mkString("\n")
    val out = fs.create(manPath, true)
    out.write(corrupted.getBytes)
    out.close()
    // a full-rewrite write over the corrupt store: retention must ignore
    // the unresolvable version rather than resolve anything outside root
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "b")), root, Some(1L), B, None)
    assert(Files.isDirectory(victim))
    assert(state(root) == Map(1L -> "b"))
  }

  test("object-store schemes route to the object committer; forcing the " +
      "rename committer onto one fails fast (contract error, not classpath)") {
    // auto mode: object schemes get the rename-free commit protocol — no
    // override flag needed, no refusal (the actual write would then fail
    // only for the honest reason: no connector/credentials in this env)
    Seq("s3a://b/state", "s3://b/x", "gs://b/x",
      "abfss://c@a.dfs.core.windows.net/x", "wasb://c@a/x").foreach { root =>
      assert(SnapshotStore.committerFor(root) == "object", root)
    }
    // FORCING the rename committer onto an object scheme hits the gate —
    // by SCHEME STRING, before any FileSystem resolution, so the refusal
    // is this message, not a hadoop-aws classpath error
    spark.conf.set(SnapshotStore.CommitterConfKey, "rename")
    try {
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.writeNext(df(Seq(1L -> "a")), "s3a://some-bucket/state")
      }
      assert(e.getMessage.contains("not atomic"))
      assert(e.getMessage.contains(SnapshotStore.AllowNonAtomicRenameKey))
    } finally spark.conf.unset(SnapshotStore.CommitterConfKey)
    // the direct gate keeps refusing object schemes without the legacy
    // escape hatch (consulted only when the rename committer is forced)
    Seq("s3://b/x", "gs://b/x", "abfss://c@a.dfs.core.windows.net/x",
      "wasb://c@a/x").foreach { root =>
      intercept[IllegalArgumentException](SnapshotStore.requireAtomicRename(root))
    }
    // the escape hatch gets past the gate (documented best-effort mode)
    spark.conf.set(SnapshotStore.AllowNonAtomicRenameKey, "true")
    try SnapshotStore.requireAtomicRename("s3a://some-bucket/state")
    finally spark.conf.unset(SnapshotStore.AllowNonAtomicRenameKey)
    // atomic-rename filesystems are untouched by the gate and keep the
    // rename committer by default
    SnapshotStore.requireAtomicRename("/tmp/x")
    SnapshotStore.requireAtomicRename("file:///tmp/x")
    SnapshotStore.requireAtomicRename("hdfs://nn:8020/x")
    assert(SnapshotStore.committerFor(
      java.nio.file.Files.createTempDirectory("cfr").toString) == "rename")
    // the IVF maintainer's delta/ledger root is gated on the
    // conditional-create CAPABILITY (its ledger publish is an exclusive
    // create on object schemes): an s3a root with no connector — and, on
    // a real cluster, a classic S3A whose create(overwrite=false) is
    // HEAD-then-PUT — is refused before any write, naming the conf that
    // acknowledges a store with unadvertised conditional-create support
    val e2 = intercept[IllegalArgumentException] {
      IncrementalIvf.merge(df(Seq(1L -> "a")), df(Seq(1L -> "a")),
        0L, "s3a://some-bucket/ivf")
    }
    assert(e2.getMessage.contains("exclusive-create"))
    assert(e2.getMessage.contains(SnapshotStore.AssumeConditionalCreateKey))
  }

  test("empty state round-trips: schema survives in the manifest") {
    val root = Files.createTempDirectory("bucketed-empty").toString
    SnapshotStore.writeNextBucketed(df(Seq(1L -> "a")), root, Some(0L), B, None)
    // delete the only row
    SnapshotStore.writeNextBucketed(df(Seq.empty), root, Some(1L),
      B, Some(df(Seq(1L -> "")).select("k")))
    val cur = SnapshotStore.read(spark, root).get
    assert(cur.count() == 0L)
    assert(cur.columns.toSeq == Seq("k", "v"))
    // and a fresh write resumes normally
    SnapshotStore.writeNextBucketed(df(Seq(5L -> "e")), root, Some(2L),
      B, Some(df(Seq(5L -> "")).select("k")))
    assert(state(root) == Map(5L -> "e"))
  }
}
