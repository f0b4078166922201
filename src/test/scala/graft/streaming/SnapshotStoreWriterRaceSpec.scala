package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Single-writer enforcement: a second writer racing the same store root
  * must FAIL LOUDLY at the publish/commit point with the winner's data
  * untouched — never silently destroy a committed version (the old
  * in-place `mode(overwrite)` hazard) and never commit a lost update.
  */
class SnapshotStoreWriterRaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("snapshot-writer-race-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fs(root: String) =
    new Path(root).getFileSystem(new org.apache.hadoop.conf.Configuration())

  private def df(vals: Long*) = {
    import spark.implicits._
    vals.toDF("x")
  }

  test("publishVersionDir refuses an existing version dir and leaves it intact") {
    val root = Files.createTempDirectory("race1").toString
    val f = fs(root)
    // the winner's published version
    SnapshotStore.writeNext(df(1L, 2L), root, Some(0L))
    val winner = new Path(root, "v=1")
    val winnerFiles = f.listStatus(winner).map(_.getPath.getName).toSet

    // the loser staged the same version number concurrently
    val token = "loser-token"
    val staging = new Path(root, s"_staging_1.$token")
    f.mkdirs(staging)
    f.create(new Path(staging, s"_WRITER.$token"), true).close()

    val e = intercept[SnapshotStore.ConcurrentWriterException] {
      SnapshotStore.publishVersionDir(f, new Path(root), staging, winner, token)
    }
    assert(e.getMessage.contains("concurrent snapshot writer"))
    assert(f.listStatus(winner).map(_.getPath.getName).toSet === winnerFiles,
      "winner's version dir must be untouched")
    assert(!f.exists(staging), "loser's staging must be cleaned up")
    // and the store still reads the winner's rows
    assert(SnapshotStore.read(spark, root).get.count() === 2L)
  }

  test("commit refuses to publish at-or-below an already committed version") {
    val root = Files.createTempDirectory("race2").toString
    SnapshotStore.writeNext(df(1L), root, Some(0L)) // v=1 committed
    SnapshotStore.writeNext(df(1L, 2L), root, Some(1L)) // v=2 committed

    // a straggler writer that computed v=2 (or an even older base) before
    // the second commit landed must not adopt its stale merge
    intercept[SnapshotStore.ConcurrentWriterException] {
      SnapshotStore.commit(root, 2L, Some(2L))
    }
    intercept[SnapshotStore.ConcurrentWriterException] {
      SnapshotStore.commit(root, 1L, Some(2L))
    }
    assert(SnapshotStore.lastBatchId(root) === 1L, "state must be unchanged")
  }

  test("crash-leftover staging dirs are invisible and swept by the next write") {
    val root = Files.createTempDirectory("race3").toString
    val f = fs(root)
    SnapshotStore.writeNext(df(1L), root, Some(0L))
    // a dead writer's leftover
    val stale = new Path(root, "_staging_2.dead-writer")
    f.mkdirs(stale)
    f.create(new Path(stale, "part-junk.parquet"), true).close()

    assert(SnapshotStore.read(spark, root).get.count() === 1L,
      "staging must be invisible to readers")
    SnapshotStore.writeNext(df(1L, 2L, 3L), root, Some(1L))
    assert(!f.exists(stale), "next successful write must sweep stale staging")
    assert(SnapshotStore.read(spark, root).get.count() === 3L)
  }

  test("bucketed write path publishes through staging too (manifest complete at publish)") {
    val root = Files.createTempDirectory("race4").toString
    val f = fs(root)
    val buckets = SnapshotStore.Buckets(Seq("x"), 8)
    SnapshotStore.writeNextBuckets(df(1L, 2L, 3L), root, Some(0L), buckets, None)
    // the published version carries manifest + commit + the writer token
    val v1 = new Path(root, "v=1")
    val names = f.listStatus(v1).map(_.getPath.getName).toSet
    assert(names.contains("_MANIFEST") && names.contains("_COMMIT"))
    assert(names.exists(_.startsWith("_WRITER.")),
      s"expected the writer token in $names")
    assert(!f.listStatus(new Path(root)).exists(
      _.getPath.getName.startsWith("_staging_")))
    assert(SnapshotStore.read(spark, root).get.count() === 3L)
    // incremental follow-up still works and sweeps nothing it shouldn't
    SnapshotStore.writeNextBuckets(df(1L, 2L, 3L, 4L), root, Some(1L), buckets,
      Some(Set.empty[Int] ++ (0 until 8)))
    assert(SnapshotStore.read(spark, root).get.count() === 4L)
  }
}
