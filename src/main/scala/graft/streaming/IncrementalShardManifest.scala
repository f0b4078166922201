package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental maintenance of the p23 training-shard manifest under an
  * append-only document stream — the manifest a shard is PUBLISHED with
  * (doc/token/char supply, language and source breadth, id range,
  * order-independent content checksum) stays current as documents land,
  * without ever re-scanning the corpus.
  *
  * State is one row per (shard, lang, source) carrying that cell's partial
  * sums, min/max ids and checksum. That granularity is the coarsest one
  * from which EVERY manifest column re-derives exactly: the additive
  * columns re-sum, min/max re-fold, and the distinct lang/source counts
  * are row counts over the cell keys — so [[manifest]] runs the SAME
  * shared aggregate ([[graft.analytics.Curation.manifestAgg]]) the batch
  * p23 query runs over raw cards, and the two views are bit-identical by
  * construction (pinned by IncrementalShardManifestSpec). Cardinality is
  * shards × live (lang, source) pairs — hundreds of rows, not corpus rows.
  *
  * Append-only is a design statement, not a shortcut: a takedown edits a
  * shard's CONTENT, so the honest response is to rewrite that shard file
  * and re-publish its card from the rewrite (the batch p23 over the
  * surviving rows), not to patch the manifest — min/max/distinct are not
  * retractable from sums, and a manifest that disagrees with the bytes in
  * the shard file is worse than a stale one.
  *
  * At 100 TB: per-batch work is O(batch) map-side (the card projection is
  * codegen'd column work) + one tiny shuffle onto the touched cells;
  * the snapshot merge reads and rewrites ONLY the buckets those cells
  * hash into ([[SnapshotStore.readTouched]]/[[SnapshotStore.writeNextBuckets]]),
  * and replays after a crash are skipped by the recorded batch id — the
  * same transactional-sink contract as the other maintainers.
  */
object IncrementalShardManifest {

  private val Key = Seq("shard", "lang", "source")

  /** Reduce one batch of document arrivals (doc_id, text, lang, source,
    * n_chars) to per-(shard, lang, source) partial manifest rows. */
  def deltas(docs: DataFrame): DataFrame =
    graft.analytics.Curation.shardCards(docs)
      .groupBy(col("shard"), col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("nt"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(col("chk")).as("chk"))

  /** The per-batch merge frame — exposed so the spec can assert its shape
    * (leaves = snapshot + batch, one join, no window). Fold is the
    * associative cell merge: sums add, bounds fold via least/greatest
    * (which skip the null side a full-outer join introduces). */
  private[streaming] def mergedFrame(cur: Option[DataFrame], d: DataFrame): DataFrame =
    cur match {
      case Some(c) =>
        // null-SAFE key equality: lang/source may be NULL in real corpora
        // and the batch GROUP BY puts all NULLs of a key in one group, so
        // the merge must match the snapshot's NULL cell, not miss it
        c.as("c").join(d.as("d"),
          Key.map(k => col(s"c.$k") <=> col(s"d.$k")).reduce(_ && _),
          "full_outer")
          .select(
            Key.map(k => coalesce(col(s"c.$k"), col(s"d.$k")).as(k)) ++ Seq(
              (coalesce(col("c.n_docs"), lit(0L)) +
                coalesce(col("d.n_docs"), lit(0L))).as("n_docs"),
              (coalesce(col("c.nt"), lit(0L)) +
                coalesce(col("d.nt"), lit(0L))).as("nt"),
              (coalesce(col("c.n_chars"), lit(0L)) +
                coalesce(col("d.n_chars"), lit(0L))).as("n_chars"),
              least(col("c.min_id"), col("d.min_id")).as("min_id"),
              greatest(col("c.max_id"), col("d.max_id")).as("max_id"),
              (coalesce(col("c.chk"), lit(0L)) +
                coalesce(col("d.chk"), lit(0L))).as("chk")): _*)
      case None => d
    }

  /** Apply one batch of arrivals to the state at `stateRoot`. Skips
    * batches already applied (exactly-once under foreachBatch replay). */
  def merge(docs: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = docs.sparkSession
    import graft.GraftSession.MaterializeOps
    val d = deltas(docs).materialized
    val buckets = SnapshotStore.bucketsFor(spark, Key)
    val tb = SnapshotStore.bucketIds(d.select(Key.map(col): _*), buckets)
    val merged = mergedFrame(
      SnapshotStore.readTouched(spark, stateRoot, buckets, tb), d)
    SnapshotStore.writeNextBuckets(merged, stateRoot, Some(batchId), buckets, Some(tb))
  }

  /** Takedown follow-through — the scaladoc's "rewrite the shard and
    * re-publish its card" as code: after a takedown physically rewrote
    * shard `shardId`'s file, recompute that ONE shard's manifest cells
    * from the surviving rows (the batch p23 over the post-rewrite shard,
    * via the same shared [[graft.analytics.Curation.shardCards]]
    * projection and cell aggregate the arrival path uses) and swap them
    * into the snapshot in place of the shard's previous cells — under the
    * usual batch-id discipline, so a crash-replay of the republish is
    * skipped like any other batch.
    *
    * `survivingDocs` must be the COMPLETE post-takedown content of the
    * shard (doc_id, text, lang, source, n_chars) — exactly the rows the
    * shard rewrite just wrote; rows hashing to any other shard are a
    * caller error and refused loudly (they would corrupt that shard's
    * cells). Cost: one pass over the rewritten shard (which the physical
    * rewrite already paid) + a cell-sized snapshot swap; untouched
    * shards' cells ride through the bucketed write untouched. */
  def republishShard(survivingDocs: DataFrame, shardId: Int, batchId: Long,
      stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = survivingDocs.sparkSession
    import graft.GraftSession.MaterializeOps
    val fresh = deltas(survivingDocs).materialized
    require(fresh.filter(col("shard") =!= shardId).isEmpty,
      s"republishShard($shardId) was fed rows hashing to OTHER shards — " +
        "pass exactly the rewritten shard's surviving rows")
    // the state is cell-granularity (shards x langs x sources — hundreds
    // of rows), so reading it whole to locate the shard's previous cells
    // is metadata-cheap; the WRITE still prunes to the touched buckets
    val cur = SnapshotStore.read(spark, stateRoot)
    val merged = cur match {
      case Some(c) => c.filter(col("shard") =!= shardId).unionByName(fresh)
      case None => fresh
    }
    val buckets = SnapshotStore.bucketsFor(spark, Key)
    val touchedKeys = (cur match {
      case Some(c) => c.filter(col("shard") === shardId)
        .select(Key.map(col): _*).unionByName(fresh.select(Key.map(col): _*))
      case None => fresh.select(Key.map(col): _*)
    })
    val tb = SnapshotStore.bucketIds(touchedKeys, buckets)
    SnapshotStore.writeNextBuckets(merged, stateRoot, Some(batchId), buckets, Some(tb))
  }

  /** Start the streaming maintainer over a document-arrival stream. */
  def start(docs: DataFrame, stateRoot: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** The maintained manifest — the exact p23 output (shard, n_docs,
    * n_tokens, n_chars, n_langs, n_sources, min_doc_id, max_doc_id,
    * checksum), produced by the shared aggregate over the state cells. */
  def manifest(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot).map { st =>
      graft.analytics.Curation.manifestAgg(st.select(
        col("shard"), col("lang"), col("source"), col("n_docs"), col("nt"),
        col("n_chars"), col("min_id"), col("max_id"), col("chk")))
    }
}
