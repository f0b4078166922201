package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** foreachBatch MERGE materializer + watermark-bounded streaming dedup. */
class CurrentStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("current-state-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // rows: (user_id, event_id, event_type, us, value)
  private type Ev = (Long, Long, String, Long, Double)

  test("current-state snapshot: latest-wins across micro-batches, idempotent on replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("state").toString
    val ckp = Files.createTempDirectory("ckp").toString
    val stream = MemoryStream[Ev]
    val df = stream.toDS().toDF("user_id", "event_id", "event_type", "us", "value")
    val q = CurrentState.start(df, stateRoot, ckp)

    stream.addData((1L, 1L, "view", 100L, 1.0), (2L, 2L, "view", 100L, 2.0))
    q.processAllAvailable()
    stream.addData((1L, 3L, "purchase", 200L, 9.0)) // supersedes user 1
    stream.addData((3L, 4L, "view", 150L, 3.0))     // new key
    q.processAllAvailable()
    q.stop()

    val state = CurrentState.read(spark, stateRoot).get
      .as[Ev].collect().toVector.sortBy(_._1)
    assert(state == Vector(
      (1L, 3L, "purchase", 200L, 9.0),
      (2L, 2L, "view", 100L, 2.0),
      (3L, 4L, "view", 150L, 3.0)))

    // replaying an already-merged batch directly must not change the state
    // (latest-wins on (us, event_id) is idempotent)
    CurrentState.merge(
      Seq((1L, 1L, "view", 100L, 1.0)).toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot)
    val state2 = CurrentState.read(spark, stateRoot).get
      .as[Ev].collect().toVector.sortBy(_._1)
    assert(state2 == state)

    // retention is bounded: every surviving v= dir is either one of the two
    // newest complete versions (current + crash fallback) or still hosts a
    // bucket one of their manifests references — nothing else survives
    val top2 = SnapshotStore.versions(stateRoot).takeRight(2).toSet
    val referenced = top2.flatMap(v =>
      SnapshotStore.manifestAt(stateRoot, v)
        .map(_.buckets.values.toSet).getOrElse(Set.empty[Long]))
    val surviving = new java.io.File(stateRoot).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName.stripPrefix("v=").toLong).toSet
    assert(surviving.subsetOf(top2 ++ referenced),
      s"unreferenced versions survive retention: $surviving vs ${top2 ++ referenced}")
  }

  test("crash mid-merge: a partial v=N dir (no _COMMIT) is never the current snapshot") {
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("state-crash").toString
    CurrentState.merge(
      Seq((1L, 1L, "view", 100L, 1.0)).toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot)
    // simulate a crash during the v=2 write: dir exists, only _temporary inside
    val partial = new java.io.File(s"$stateRoot/v=2/_temporary")
    assert(partial.mkdirs())
    // read() must fall back to the last COMPLETE version, not the partial one
    val state = CurrentState.read(spark, stateRoot).get.as[Ev].collect().toVector
    assert(state == Vector((1L, 1L, "view", 100L, 1.0)))
    // the next merge must overwrite past the partial dir (v=3), keep the
    // complete versions, and clean up the partial leftover
    CurrentState.merge(
      Seq((2L, 2L, "view", 200L, 2.0)).toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot)
    val state2 = CurrentState.read(spark, stateRoot).get.as[Ev].collect().toVector.sortBy(_._1)
    assert(state2 == Vector((1L, 1L, "view", 100L, 1.0), (2L, 2L, "view", 200L, 2.0)))
    val dirs = new java.io.File(stateRoot).listFiles().map(_.getName).filter(_.startsWith("v=")).toSet
    assert(!dirs.contains("v=2")) // partial leftover purged by retention
    assert(dirs.contains("v=3"))
  }

  test("pre-_COMMIT store migrates: _SUCCESS-only versions stay visible") {
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("state-migrate").toString
    // an old-format store: parquet + _SUCCESS, no _COMMIT markers anywhere
    Seq((1L, 1L, "view", 100L, 1.0))
      .toDF("user_id", "event_id", "event_type", "us", "value")
      .write.parquet(s"$stateRoot/v=1")
    assert(new java.io.File(s"$stateRoot/v=1/_SUCCESS").isFile)
    // visible (no silent state reset on upgrade), producing batch unknown
    val state = CurrentState.read(spark, stateRoot).get.as[Ev].collect().toVector
    assert(state == Vector((1L, 1L, "view", 100L, 1.0)))
    assert(SnapshotStore.lastBatchId(stateRoot) == -1L)
    // first new-format merge writes v=2 with _COMMIT; from then on a
    // _SUCCESS-only dir is an uncommitted partial again
    CurrentState.merge(
      Seq((2L, 2L, "view", 200L, 2.0)).toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot)
    val merged = CurrentState.read(spark, stateRoot).get.as[Ev].collect().toVector.sortBy(_._1)
    assert(merged == Vector((1L, 1L, "view", 100L, 1.0), (2L, 2L, "view", 200L, 2.0)))
    Seq((9L, 9L, "view", 900L, 9.0))
      .toDF("user_id", "event_id", "event_type", "us", "value")
      .write.parquet(s"$stateRoot/v=9") // _SUCCESS but no _COMMIT, new-format store
    assert(SnapshotStore.versions(stateRoot).max < 9L)
  }

  test("a crashed FIRST commit is not mistaken for a legacy store") {
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("state-firstcrash").toString
    // simulate: new-format writeNext crashed between the parquet job
    // (_SUCCESS exists) and the _COMMIT rename — the _FORMAT marker was
    // written first, so the fallback must NOT surface the half-commit
    CurrentState.merge(
      Seq((1L, 1L, "view", 100L, 1.0)).toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot)
    val v1commit = new java.io.File(s"$stateRoot/v=1/_COMMIT")
    assert(v1commit.delete()) // v=1 now looks exactly like the crash left it
    assert(SnapshotStore.read(spark, stateRoot).isEmpty,
      "_SUCCESS-only version in a _FORMAT-marked store must be invisible")
    assert(SnapshotStore.lastBatchId(stateRoot) == -1L)
  }

  test("writeNext does not adopt a crash leftover when any _COMMIT already exists") {
    import spark.implicits._
    val stateRoot = Files.createTempDirectory("state-preformat").toString
    // a store written by marker-aware but pre-_FORMAT code: v=1 committed,
    // v=2 is a crash leftover (_SUCCESS present, _COMMIT rename missed),
    // no root _FORMAT marker anywhere
    Seq((1L, 1L, "view", 100L, 1.0))
      .toDF("user_id", "event_id", "event_type", "us", "value")
      .write.parquet(s"$stateRoot/v=1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$stateRoot/v=1/_COMMIT"), "5".getBytes)
    Seq((2L, 2L, "stale", 200L, 2.0))
      .toDF("user_id", "event_id", "event_type", "us", "value")
      .write.parquet(s"$stateRoot/v=2")
    // the next write must treat v=2 as uncommitted (any _COMMIT in the
    // store means marker-aware history) — adopting it as batch −1 would
    // let a replayed delta-applying merge double-apply
    SnapshotStore.writeNext(
      Seq((3L, 3L, "view", 300L, 3.0))
        .toDF("user_id", "event_id", "event_type", "us", "value"),
      stateRoot, Some(7L))
    assert(SnapshotStore.versions(stateRoot) == Seq(1L, 3L))
    assert(SnapshotStore.lastBatchId(stateRoot) == 7L)
    val state = SnapshotStore.read(spark, stateRoot).get.as[Ev].collect().toVector
    assert(state == Vector((3L, 3L, "view", 300L, 3.0)))
    // a store with NO _COMMIT anywhere is still adopted (the legacy path)
    val legacyRoot = Files.createTempDirectory("state-legacy").toString
    Seq((1L, 1L, "view", 100L, 1.0))
      .toDF("user_id", "event_id", "event_type", "us", "value")
      .write.parquet(s"$legacyRoot/v=1")
    SnapshotStore.writeNext(
      Seq((2L, 2L, "view", 200L, 2.0))
        .toDF("user_id", "event_id", "event_type", "us", "value"),
      legacyRoot, Some(0L))
    assert(SnapshotStore.versions(legacyRoot) == Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark removes re-delivered event_ids") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Long)] // (sec, event_id)
    val df = stream.toDS().toDF("sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val q = CurrentState.dedupWithinWatermark(df, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()

    stream.addData((10L, 1L), (20L, 2L))
    q.processAllAvailable()
    stream.addData((30L, 1L), (40L, 3L)) // event 1 re-delivered within horizon
    q.processAllAvailable()
    q.stop()

    val ids = spark.sql("SELECT event_id FROM dedup").as[Long].collect().toVector.sorted
    assert(ids == Vector(1L, 2L, 3L))
  }
}
