package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Test-only `file`-scheme filesystem with WEAK exclusive-create
  * semantics: `create(path, overwrite = false)` silently overwrites —
  * the historic-NFS / permissive-FUSE failure class the static scheme
  * whitelist used to trust blindly (r16 verdict task 4). */
class WeakCreateLocalFs extends RawLocalFileSystem {
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}

/** The runtime exclusive-create probe behind
  * [[SnapshotStore.requireExclusiveCreate]]'s scheme whitelist: a
  * whitelisted scheme is no longer trusted statically — the first write
  * gate per root MEASURES that a second exclusive create of an existing
  * name fails, and refuses a filesystem that does not arbitrate at all. */
class SnapshotStoreCreateProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("snapshot-create-probe-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"probe-$tag").toString

  private def weakFs(): WeakCreateLocalFs = {
    val fs = new WeakCreateLocalFs
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  private def localFs(): RawLocalFileSystem = {
    val fs = new RawLocalFileSystem
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  test("probeExclusiveCreate measures the semantics: true on a compliant " +
      "posix filesystem, false on one whose exclusive create silently " +
      "overwrites — and cleans its probe file on both paths") {
    val good = tmpRoot("good")
    assert(SnapshotStore.probeExclusiveCreate(localFs(), good))
    val bad = tmpRoot("bad")
    assert(!SnapshotStore.probeExclusiveCreate(weakFs(), bad))
    for (root <- Seq(good, bad)) {
      val left = new java.io.File(root).listFiles()
        .map(_.getName).filter(_.startsWith(".graft_probe_create_"))
      assert(left.isEmpty, s"probe residue in $root: ${left.mkString(",")}")
    }
  }

  test("a mock weak-file filesystem is REFUSED at the gate, the refusal " +
      "names the probe, and the explicit acknowledgement conf (or probe " +
      "opt-out) waives it") {
    spark.sparkContext // force session init before touching hadoop conf
    val hc = spark.sparkContext.hadoopConfiguration
    val savedImpl = hc.get("fs.file.impl")
    val savedCache = hc.get("fs.file.impl.disable.cache")
    hc.set("fs.file.impl", classOf[WeakCreateLocalFs].getName)
    // without this the FileSystem CACHE serves the real LocalFileSystem
    // (cache keys ignore impl conf) and the override never takes effect
    hc.set("fs.file.impl.disable.cache", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.requireExclusiveCreate(tmpRoot("gate"))
      }
      assert(e.getMessage.contains("FAILED the exclusive-create probe"),
        e.getMessage)
      // acknowledged deployment: same waiver key as the capability path
      spark.conf.set(SnapshotStore.AssumeConditionalCreateKey, "true")
      try SnapshotStore.requireExclusiveCreate(tmpRoot("waived"))
      finally spark.conf.unset(SnapshotStore.AssumeConditionalCreateKey)
      // probe opt-out: static trust, as before r17
      spark.conf.set(SnapshotStore.ProbeCreateKey, "false")
      try SnapshotStore.requireExclusiveCreate(tmpRoot("optout"))
      finally spark.conf.unset(SnapshotStore.ProbeCreateKey)
    } finally {
      if (savedImpl == null) hc.unset("fs.file.impl") else hc.set("fs.file.impl", savedImpl)
      if (savedCache == null) hc.unset("fs.file.impl.disable.cache")
      else hc.set("fs.file.impl.disable.cache", savedCache)
    }
  }

  test("a compliant posix root passes the gate (probe runs, then is " +
      "cached per root) and leaves no probe residue") {
    val root = tmpRoot("pass")
    SnapshotStore.requireExclusiveCreate(root)
    SnapshotStore.requireExclusiveCreate(root) // cached second pass
    val left = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith(".graft_probe_create_"))
    assert(left.isEmpty, s"probe residue: ${left.mkString(",")}")
  }
}
