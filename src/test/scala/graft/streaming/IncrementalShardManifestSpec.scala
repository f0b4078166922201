package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incrementally-maintained shard manifest must be bit-identical to
  * the batch p23 query over the union of everything that has arrived —
  * after every micro-batch, across lang/source cells appearing for the
  * first time mid-stream, and under foreachBatch crash-replay.
  */
class IncrementalShardManifestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("incremental-shard-manifest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // (doc_id, text, lang, source, n_chars) — several langs/sources so the
  // distinct counts move mid-stream, ids interleaved so min/max move too
  private def doc(i: Long): (Long, String, String, String, Long) = {
    val langs = Seq("en", "de", "fr", null)
    val srcs = Seq("web", "books", "code")
    (i, s"doc body number $i with ${"word " * (i % 7).toInt}tail",
      langs((i % 4).toInt), srcs((i % 3).toInt), 10L + i % 50)
  }

  private def writeDocs(ids: Seq[Long], dir: String): Unit = {
    import spark.implicits._
    ids.map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(s"$dir/documents.parquet")
  }

  private def batchManifest(dir: String): Seq[org.apache.spark.sql.Row] =
    graft.SparkEntry.queries("p23_shard_manifest")(spark, dir).collect().toSeq

  private def liveManifest(root: String): Seq[org.apache.spark.sql.Row] =
    IncrementalShardManifest.manifest(spark, root).get.collect().toSeq

  test("maintained manifest equals the batch p23 after every micro-batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("shardm").toString
    val union = Files.createTempDirectory("shardmU").toString

    // three batches; batch 2 introduces a brand-new source ("code" ids) to
    // cells that already exist and batch 3 a fresh id range (min/max move)
    val slices = Seq(0L until 40L, 40L until 70L, 200L until 230L)
    slices.zipWithIndex.foreach { case (ids, b) =>
      IncrementalShardManifest.merge(
        ids.map(doc).toDF("doc_id", "text", "lang", "source", "n_chars"),
        b.toLong, root)
      writeDocs(ids, union)
      assert(liveManifest(root) === batchManifest(union),
        s"diverged from batch recompute after batch $b")
    }

    // state stays cell-sized, not corpus-sized
    val cells = SnapshotStore.read(spark, root).get.count()
    assert(cells <= 16L * 4 * 3, s"state has $cells rows — not cell-bounded")
  }

  test("crash-replay of an applied batch is a no-op; streaming path matches") {
    import spark.implicits._
    val root = Files.createTempDirectory("shardm2").toString
    val b0 = (0L until 30L).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    val b1 = (30L until 45L).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    IncrementalShardManifest.merge(b0, 0L, root)
    IncrementalShardManifest.merge(b1, 1L, root)
    val before = liveManifest(root)
    IncrementalShardManifest.merge(b1, 1L, root) // crash-replay
    IncrementalShardManifest.merge(b0, 0L, root) // stale replay
    assert(liveManifest(root) === before, "replayed batches must not re-apply")

    // the same arrivals through the real streaming path, one file per batch
    val dir = Files.createTempDirectory("shardmS")
    val root2 = Files.createTempDirectory("shardm3").toString
    b0.write.parquet(s"$dir/f0")
    b1.write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val q = IncrementalShardManifest.start(stream, root2,
      Files.createTempDirectory("shardmC").toString)
    q.processAllAvailable()
    q.stop()
    assert(liveManifest(root2) === before)
  }

  test("takedown republish: arrival stream + one shard republish equals " +
      "the batch p23 over the post-takedown corpus, bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("shardmT").toString
    val allIds = 0L until 80L
    // arrivals in two batches
    IncrementalShardManifest.merge(
      allIds.take(50).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars"),
      0L, root)
    IncrementalShardManifest.merge(
      allIds.drop(50).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars"),
      1L, root)
    // takedown: remove three docs; they share a shard by construction of
    // the md5 shard key only by luck, so pick victims from ONE shard
    val corpus = allIds.map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    val withShard = graft.analytics.Curation.shardCards(corpus)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val shardId = withShard(0L)
    val victims = withShard.filter(_._2 == shardId).keys.take(3).toSet
    assert(victims.nonEmpty)
    val survivorIds = allIds.filterNot(victims)
    // the rewritten shard's surviving content (what the physical shard
    // rewrite just wrote) feeds the republish
    val survivingShardDocs = survivorIds.filter(id => withShard(id) == shardId)
      .map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    IncrementalShardManifest.republishShard(survivingShardDocs, shardId, 2L, root)
    // == batch p23 over the post-takedown corpus
    val union = Files.createTempDirectory("shardmTU").toString
    writeDocs(survivorIds, union)
    assert(liveManifest(root) === batchManifest(union),
      "republished manifest diverged from the batch recompute")
    // replayed republish is a no-op
    val before = liveManifest(root)
    IncrementalShardManifest.republishShard(survivingShardDocs, shardId, 2L, root)
    assert(liveManifest(root) === before)
    // feeding another shard's rows is refused loudly
    val foreign = survivorIds.filter(id => withShard(id) != shardId).take(2)
      .map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      IncrementalShardManifest.republishShard(foreign, shardId, 3L, root)
    }
    assert(e.getMessage.contains("OTHER shards"))
    assert(liveManifest(root) === before, "refused republish must not commit")
  }

  test("merge plan reads snapshot + batch only — no window, single join") {
    import spark.implicits._
    val d = IncrementalShardManifest.deltas(
      (0L until 8L).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val cur = (0L until 8L).map(doc).toDF("doc_id", "text", "lang", "source", "n_chars")
    val frame = IncrementalShardManifest.mergedFrame(
      Some(IncrementalShardManifest.deltas(cur)), d)
    val plan = frame.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected one merge join:\n$plan")
    assert(!plan.contains("Window"), s"window crept into the merge:\n$plan")
  }
}
