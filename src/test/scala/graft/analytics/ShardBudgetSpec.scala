package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Targeted gates for t27 (context-length budget) and p23 (training-shard
  * manifest) — the properties the DuckDB oracle can't see: exact closed-form
  * budget arithmetic on a hand-computable corpus, the broadcast (not
  * cartesian) plan shape of the ×4 fan-out, checksum order-independence
  * (the manifest must not depend on row arrival order), and per-shard
  * tamper detection (one changed document moves exactly one shard's
  * checksum and nothing else).
  */
class ShardBudgetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("shard-budget-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("t27 budget arithmetic is exact on a hand-computed corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("t27edge").toString
    Seq(
      (1L, words(3), "en", "s0", 0L),
      (2L, words(512), "en", "s0", 0L),
      (3L, words(600), "en", "s0", 0L),
      (4L, words(1100), "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = graft.SparkEntry.queries("t27_context_budget")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(512L, 1024L, 2048L, 4096L))
    // ctx=512: kept = 3+512+512+512 = 1539 of 2215; 2 docs truncate;
    // pad = 4*512-1539 = 509 of 2048; perfect packing needs ceil(1539/512)=4
    assert(rows.head == ((512L, 4L, 2L, 2215L, 1539L,
      676L * 1000000L / 2215L, 509L * 1000000L / 2048L, 4L)), s"got ${rows.head}")
    // monotone in ctx: kept grows, truncation shrinks
    assert(rows.map(_._5) == rows.map(_._5).sorted)
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
  }

  test("t27 fan-out is a broadcast of the 4-row frame, not a cartesian") {
    val df = graft.SparkEntry.queries("t27_context_budget")(
      spark, graft.TestTables.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("p23 manifest covers the corpus exactly and is order-independent") {
    import spark.implicits._
    val dir = graft.TestTables.sfDir
    val docs = graft.Tables.t(spark, dir, "documents")
    val manifest = graft.SparkEntry.queries("p23_shard_manifest")(spark, dir)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

    assert(manifest.forall(r => r._1 >= 0 && r._1 < 16))
    assert(manifest.map(_._2).sum == docs.count())
    assert(manifest.map(_._4).sum ==
      docs.agg(org.apache.spark.sql.functions.sum($"n_chars")).as[Long].head())

    // order-independence: the same rows written in reverse doc order
    // produce the identical manifest (sum-checksums commute)
    val rev = Files.createTempDirectory("p23rev").toString
    docs.orderBy($"doc_id".desc).coalesce(1)
      .write.parquet(s"$rev/documents.parquet")
    val manifest2 = graft.SparkEntry.queries("p23_shard_manifest")(spark, rev)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(manifest2 == manifest)
  }

  test("p23 tamper detection: one changed document moves exactly one " +
      "shard's checksum") {
    import spark.implicits._
    val base = Files.createTempDirectory("p23base").toString
    val docs = (1L to 64L).map(i => (i, s"doc body $i", "en", "s0", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/documents.parquet")
    val tam = Files.createTempDirectory("p23tam").toString
    docs.map { case (i, t, l, s, c) =>
      if (i == 7L) (i, t + " TAMPERED", l, s, c) else (i, t, l, s, c) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tam/documents.parquet")

    def m(d: String) = graft.SparkEntry.queries("p23_shard_manifest")(spark, d)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.map(r => r._1 -> r).toMap
    val (a, b) = (m(base), m(tam))
    assert(a.keySet == b.keySet)
    val moved = a.keySet.filter(k => a(k)._9 != b(k)._9)
    assert(moved.size == 1, s"checksum moved on shards $moved")
    // the shard key is content-independent: doc counts and id ranges hold
    assert(a.keySet.forall(k => (a(k)._2, a(k)._7, a(k)._8) ==
      ((b(k)._2, b(k)._7, b(k)._8))))
  }
}
