package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the dup-graph connected-component labels —
  * the structure every downstream curation action consumes (p03's cluster
  * report, p11's leakage-safe split, d18 canonical selection, d19 soft
  * dedup, p17's mixture) — under an ARRIVING edge stream, e.g. the
  * near-dup pairs the ingest gates (IngestNearDup / IngestMediaDedup /
  * IngestVideoDedup) emit at admission time.
  *
  * Semantics: after any prefix of edge batches, `view` equals the batch
  * contraction (`Curation.contractComponents`) of the union of those
  * batches — `(node, lab)` with `lab` = the component's minimum node id,
  * exactly the label rule the batch pipeline uses, so a consumer can swap
  * the incremental view in without re-deriving anything.
  *
  * Why incrementality is cheap here: component labels are a CLOSURE under
  * edge arrival. A new edge can only MERGE components, never split them,
  * so the per-batch work is:
  *
  *  1. map the batch's endpoints through the current labels — each node
  *     stands in for its component representative (its min); unseen nodes
  *     represent themselves. This is the batch's ONE probe of the
  *     snapshot (a first-seen flag rides the same join, so fresh nodes
  *     need no second probe); at scale it is a co-located lookup against
  *     a labels table bucketed by node.
  *  2. contract the REPRESENTATIVE graph — bounded by the batch's edge
  *     count, not the corpus: every old component is one supernode. This
  *     reuses the exact p03 union-find machinery.
  *  3. relabel: old labels re-point through the delta (old rep → merged
  *     rep); nodes first seen in this batch enter with their contracted
  *     label. The delta is batch-bounded, so the relabel join broadcasts
  *     it against the snapshot — no corpus-sized shuffle anywhere.
  *
  * Correctness of the min-label invariant: old reps are component minima,
  * so the contracted minimum over the rep graph IS the minimum of the
  * merged node set (new node ids participate directly).
  *
  * Exactly-once under foreachBatch replay: the snapshot records the
  * producing batch id (`SnapshotStore` `_COMMIT`); `merge` skips any
  * batch at-or-below it. A replay that slips through the recovered-batch
  * path is still safe — re-merging edges already inside one component
  * yields an EMPTY rep graph and the labels pass through unchanged
  * (idempotent), and any batch split converges because union-find is
  * confluent.
  *
  * At 100 TB: the labels snapshot is the only corpus-scaled state (one
  * row per edge-touched node — smaller than the document corpus); a batch
  * costs one snapshot probe (step 1), a batch-sized contraction (step 2),
  * and one broadcast-delta relabel scan (step 3, shuffle-free — pinned by
  * StreamShapeSpec). The snapshot buckets on node and the batch's write
  * materializes only the buckets holding fresh or relabeled nodes
  * ([[SnapshotStore.writeNextBucketed]]) — the MERGE-INTO write shape
  * over exactly the merged components' rows.
  */
object IncrementalComponents {

  /** Normalize an edge batch to undirected (src<dst) distinct pairs.
    * Self-loops carry no merge information and are dropped HERE — but
    * their nodes still enter the label set (see `merge`), matching the
    * batch contraction, which labels a self-loop's node as itself. */
  private def normalized(edges: DataFrame): DataFrame =
    edges.select(least(col("i"), col("j")).as("src"),
        greatest(col("i"), col("j")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** The relabel frame (step 3) — exposed pure for plan-shape assertions:
    * the snapshot relabels through a BROADCAST of the batch-bounded delta
    * (one join, no window, no corpus shuffle). */
  private[streaming] def relabeled(cur: DataFrame, delta: DataFrame): DataFrame =
    cur.as("l")
      .join(broadcast(delta).as("d"), col("l.lab") === col("d.node"), "left")
      .select(col("l.node").as("node"),
        coalesce(col("d.lab"), col("l.lab")).as("lab"))

  /** Apply one edge batch. Batches replayed at-or-below the committed id
    * are skipped (foreachBatch contract). */
  def merge(edges: DataFrame, batchId: Long, stateRoot: String): Unit = {
    if (batchId <= SnapshotStore.lastBatchId(stateRoot)) return // replay
    val spark = edges.sparkSession
    import graft.GraftSession.MaterializeOps
    val e = normalized(edges).materialized
    val cur = SnapshotStore.read(spark, stateRoot)
    // node set from the RAW endpoints (self-loop nodes must still label,
    // like the batch contraction's (x, x) row for an (x, x) edge)
    val nodes = edges.select(col("i").as("node"))
      .union(edges.select(col("j"))).distinct()
    // each endpoint stands in for its component rep (self when unseen);
    // the first-seen flag rides this ONE snapshot probe so fresh nodes
    // need no second (anti-join) pass over the corpus-sized labels
    val repOf = (cur match {
      case Some(c) => nodes.join(c, Seq("node"), "left")
        .select(col("node"), coalesce(col("lab"), col("node")).as("rep"),
          col("lab").isNull.as("is_fresh"))
      case None =>
        nodes.select(col("node"), col("node").as("rep"), lit(true).as("is_fresh"))
    }).materialized
    val repEdges = e
      .join(repOf.as("a"), col("src") === col("a.node"))
      .join(repOf.as("b"), col("dst") === col("b.node"))
      .select(col("a.rep").as("i"), col("b.rep").as("j"))
      .filter(col("i") =!= col("j"))
    // batch-bounded: every old component is one supernode here
    val delta = graft.analytics.Curation.contractComponents(spark, repEdges)
      .materialized
    // first-seen nodes enter with their contracted label (self if their
    // every edge vanished into an existing component or was a self-loop)
    val fresh = repOf.filter(col("is_fresh")).as("n")
      .join(broadcast(delta).as("d"), col("n.rep") === col("d.node"), "left")
      .select(col("n.node").as("node"),
        coalesce(col("d.lab"), col("n.rep")).as("lab"))
    val next = cur.map(c => relabeled(c, delta).unionByName(fresh)).getOrElse(fresh)
    // a row changes only if its node is fresh or its label was one of the
    // merged old reps — so the touched-key set is fresh nodes ∪ the
    // members of relabeled components (one broadcast semi-join probe of
    // the labels; the relabel scan reads them anyway). Reads stay FULL by
    // design: membership of a merged component is a property of the LAB
    // column, not the node-bucket, so detecting the touched rows needs the
    // broadcast probe over all labels — only the WRITE prunes to the
    // touched nodes' buckets (a lab→bucket inverted index would buy read
    // pruning at the cost of a second maintained structure).
    val touchedNodes = fresh.select("node").unionByName(cur match {
      case Some(c) => c.as("l")
        .join(broadcast(delta).as("d"), col("l.lab") === col("d.node"), "left_semi")
        .select(col("node"))
      case None => fresh.select("node").limit(0)
    })
    SnapshotStore.writeNextBucketed(next, stateRoot, Some(batchId),
      SnapshotStore.bucketsFor(spark, Seq("node")), Some(touchedNodes))
  }

  /** Run the maintainer over a streaming `(i, j)` edge frame — e.g. the
    * gate's `IngestNearDup.verifiedPairs` per batch. */
  def start(edges: DataFrame, stateRoot: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) => merge(batch, id, stateRoot) }
      .start()

  /** The maintained `(node, lab)` labels (None before the first batch). */
  def view(spark: SparkSession, stateRoot: String): Option[DataFrame] =
    SnapshotStore.read(spark, stateRoot)
}
