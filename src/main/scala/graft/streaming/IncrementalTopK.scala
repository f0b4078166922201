package graft.streaming

import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained per-key top-k view over a CDC change stream —
  * the composition of the two marquee pieces: `IncrementalAgg`'s
  * transactional foreachBatch snapshot contract and the custom
  * `TopK.perKey` operator doing the ranking.
  *
  * Top-k is NOT deletion-incremental from k rows of state alone: deleting
  * a current top-k member must promote the (k+1)-th row, which a k-row
  * sketch has already discarded. So the maintainer keeps TWO snapshots:
  *
  *  - `base/` — the live rows (id, key, score), maintained latest-wins by
  *    id (insert/update upsert, delete removes; an update may MOVE a row
  *    between keys). This is the CDC target relation you materialize
  *    anyway; at 100 TB it is a transactional table and this merge is its
  *    MERGE INTO.
  *  - `view/` — the per-key top-k. Per batch, ONLY the keys the batch
  *    touched (old and new key of every op) re-rank, via `TopK.perKey`
  *    over just those keys' base rows (a semi-join, then the bounded-heap
  *    partial/final passes); untouched keys' view rows carry over
  *    unchanged. Per-batch ranking work is O(rows of touched keys), never
  *    a corpus re-rank.
  *
  * Exactly-once under foreachBatch replay mirrors IncrementalAgg: both
  * snapshots record the producing batch id; a replayed batch at-or-below
  * it is skipped (the paired writes are ordered base-then-view, and the
  * skip keys off the VIEW's id — written last, so a crash between the two
  * writes replays the batch and rewrites both, which is safe because the
  * base merge is idempotent latest-wins by id).
  *
  * Change-row contract: `op` ('i'|'u'|'d'), `seq` (the stream's total
  * order — the wire protocol's seq number; within a batch the LAST op per
  * id wins, so an insert-then-delete batch nets to absence and an
  * insert-then-update nets to one row), `id`, `key_old`, `score_old`
  * (null for inserts), `key_new`, `score_new` (null for deletes).
  */
object IncrementalTopK {

  final case class Roots(root: String) {
    val base: String = s"$root/base"
    val view: String = s"$root/view"
  }

  /** Apply one batch. `k` rows kept per key, ordered score DESC, id ASC
    * (the deterministic total order TopK.perKey requires). */
  def merge(ops: DataFrame, batchId: Long, root: String, k: Int): Unit = {
    val roots = Roots(root)
    if (batchId <= SnapshotStore.lastBatchId(roots.view)) return // replay
    val spark = ops.sparkSession

    // ---- base: latest-wins by id ----
    // a batch may carry SEVERAL ops for one id (insert-then-delete,
    // insert-then-update); only the last-by-seq op decides the id's final
    // state — applying raw upserts would resurrect deleted rows and leave
    // duplicate ids
    val lastOp = ops.groupBy(col("id"))
      .agg(max_by(struct(col("op"), col("key_new"), col("score_new")), col("seq")).as("f"))
      .select(col("id"), col("f.op").as("op"),
        col("f.key_new").as("key"), col("f.score_new").as("score"))
    val upserts = lastOp.filter(col("op").isin("i", "u")).drop("op")
    val touchedIds = ops.select(col("id")).distinct()
    val newBase = (SnapshotStore.read(spark, roots.base) match {
      case Some(cur) => cur.join(touchedIds, Seq("id"), "left_anti").unionByName(upserts)
      case None => upserts
    }).cache()

    // ---- view: re-rank ONLY the touched keys ----
    // from ALL ops of the batch, not just each id's last: any key that
    // gained or lost a row at any point must re-rank
    val touchedKeys = ops.select(col("key_old").as("key"))
      .unionByName(ops.select(col("key_new").as("key")))
      .filter(col("key").isNotNull).distinct()
    val reranked = rerank(newBase, touchedKeys, k)
    val newView = SnapshotStore.read(spark, roots.view) match {
      case Some(cur) => cur.join(touchedKeys, Seq("key"), "left_anti")
        .unionByName(reranked.select(cur.columns.map(col).toSeq: _*))
      case None => reranked
    }

    // base first, view (with the batch id) last — see the scaladoc.
    // Both stores are corpus-proportional, so both write bucketed: base
    // on id (touched ids' buckets), view on key (touched keys' buckets).
    // Reads stay FULL here by design: the re-rank must gather ALL base
    // rows of a touched key, and those are spread across id-buckets — a
    // read prune by touched ids would drop the very rows the heap ranks.
    // (A key-bucketed secondary index would buy read pruning; the write
    // side is where the state-proportional cost lived.)
    SnapshotStore.writeNextBucketed(newBase, roots.base, Some(batchId),
      SnapshotStore.bucketsFor(spark, Seq("id")), Some(touchedIds))
    SnapshotStore.writeNextBucketed(newView, roots.view, Some(batchId),
      SnapshotStore.bucketsFor(spark, Seq("key")), Some(touchedKeys))
    newBase.unpersist()
  }

  /** The per-batch re-rank FRAME — TopK over the touched keys' base rows
    * only (semi-join before the heap passes), exposed as a seam so
    * StreamShapeSpec can assert the shape: the ranking input is bounded by
    * `touchedKeys`, never the whole base. */
  private[streaming] def rerank(newBase: DataFrame, touchedKeys: DataFrame,
      k: Int): DataFrame =
    TopK.perKey(
      newBase.join(touchedKeys, Seq("key"), "left_semi"),
      Seq("key"), Seq("score" -> false, "id" -> true), k)

  def start(ops: DataFrame, root: String, checkpointDir: String, k: Int): StreamingQuery =
    ops.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, root, k) }
      .start()

  /** The maintained view (key, id, score). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    SnapshotStore.read(spark, Roots(root).view)

  /** The maintained base relation (id, key, score). */
  def readBase(spark: SparkSession, root: String): Option[DataFrame] =
    SnapshotStore.read(spark, Roots(root).base)
}
