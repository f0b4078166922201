package graft.analytics

import graft.GraftSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-materialization seam: every iterated plan (p03/p15/p16/p21
  * contractions, BFS levels, t21's vocab loop) cuts lineage through
  * `GraftSession.materialize`. Locally that is `localCheckpoint` (executor
  * blocks, fast); with `spark.graft.checkpointDir` set it MUST become a
  * reliable `checkpoint()` — on a preemptible cluster a lost
  * executor-local block fails the whole job, while a reliable checkpoint
  * re-reads from fault-tolerant storage. This spec pins both sides of the
  * seam and runs a representative iterated query under the reliable mode.
  */
class ReliableMaterializeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.builder(shufflePartitions = 4)
    .master("local[2]")
    .appName("reliable-materialize-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val ckpDir =
    java.nio.file.Files.createTempDirectory("graft-ckp").toString

  override def afterAll(): Unit = spark.stop()

  private def withCheckpointDir[A](f: => A): A = {
    spark.conf.set(GraftSession.CheckpointDirKey, ckpDir)
    try f finally spark.conf.unset(GraftSession.CheckpointDirKey)
  }

  test("without the conf, materialize is an executor-local checkpoint") {
    import spark.implicits._
    val df = GraftSession.materialize(Seq(1L, 2L, 3L).toDF("x"))
    assert(df.rdd.toDebugString.contains("LocalCheckpointRDD"))
    assert(df.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("with spark.graft.checkpointDir set, materialize is a RELIABLE " +
      "checkpoint: ReliableCheckpointRDD in the lineage, files on disk") {
    import spark.implicits._
    val df = withCheckpointDir {
      GraftSession.materialize(Seq(4L, 5L).toDF("x"))
    }
    assert(df.rdd.toDebugString.contains("ReliableCheckpointRDD"),
      s"lineage was:\n${df.rdd.toDebugString}")
    assert(df.as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    // the checkpoint physically landed in the configured directory
    def count(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
    assert(count(java.nio.file.Paths.get(ckpDir)) > 0,
      "reliable checkpoint wrote no files under spark.graft.checkpointDir")
  }

  test("a representative iterated plan (the p03 union-find contraction) " +
      "runs whole under reliable mode with identical output") {
    import spark.implicits._
    // two components: {1,2,3,4} via a chain, {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val expect = Curation.contractComponents(spark, edges)
      .as[(Long, Long)].collect().toSet
    val labels = withCheckpointDir(Curation.contractComponents(spark, edges))
    assert(labels.rdd.toDebugString.contains("ReliableCheckpointRDD"),
      s"iterated plan did not route through the reliable seam:\n${labels.rdd.toDebugString}")
    val got = labels.as[(Long, Long)].collect().toSet
    assert(got == expect)
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }
}
