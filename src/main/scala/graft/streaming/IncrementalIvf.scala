package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the IVF assignment index — the s05 build kept
  * LIVE as embeddings arrive, under the FROZEN-QUANTIZER contract a
  * production ANN deployment actually runs: the coarse quantizer
  * (refined centroids) is trained offline and pinned between re-trains
  * (`Similarity.ivfCentroids`), so an arriving vector's cell depends
  * only on the vector and the broadcast centroids — assignment is
  * STATELESS per row, and maintenance is exactly delta-only:
  *
  *  - per batch: one batch×k broadcast argmax-cosine scan
  *    (`Similarity.assignVectors` — bit-identical to the batch build's
  *    assignment step, factored for precisely this reuse), then
  *  - the cell-count sufficient statistics merge additively (k rows at
  *    any corpus size — the balance view's only state), and
  *  - the batch's assignment rows land as an idempotent parquet delta
  *    under `assignDir/batch=<id>` (a replayed micro-batch sees its
  *    directory exists and skips — the write-once twin of
  *    [[SnapshotStore]]'s batch-id contract, without rewriting the
  *    corpus-sized table per batch).
  *
  * Delta dirs are COMPACTED so the directory count stays bounded: when
  * more than `spark.graft.ivf.assign.maxDeltaDirs` (default 16) batch
  * dirs exist, the older half folds into one combined `batch=<maxId>`
  * dir (cost ∝ the folded deltas, amortized O(1) dirs per batch — never
  * a corpus rewrite). The fold is crash-safe: combined rows land in an
  * underscore-prefixed staging dir (invisible to the root parquet read),
  * a `_folded_through` watermark publishes via atomic rename BEFORE any
  * original dir is deleted, and an interrupted fold is either completed
  * or discarded deterministically on the next merge. The watermark also
  * keeps replay exact: a replayed batch at or below it must NOT rewrite
  * its (now folded-away) delta dir.
  *
  * All metadata IO (existence probes, watermark, fold staging) goes
  * through `org.apache.hadoop.fs.FileSystem` resolved from the state
  * root's scheme, so the index works unchanged on `file://` and HDFS
  * (S3A rename caveat as documented on [[SnapshotStore]]).
  *
  * `balanceView` reproduces the s20 cell-balance audit (the re-train
  * signal) over everything arrived so far; `assignments` reads the delta
  * directories back as the full index — both parity-specced against the
  * batch forms on the same rows (IncrementalIvfSpec). When the audit
  * crosses its threshold, the operator re-trains offline, swaps the
  * frozen centroids, and resets state — each generation is one exact
  * batch build.
  */
object IncrementalIvf {

  /** Conf key bounding the number of `assign/batch=<id>` delta dirs;
    * crossing it folds the older half into one dir. */
  val MaxDeltaDirsKey = "spark.graft.ivf.assign.maxDeltaDirs"

  private def fsFor(root: String): FileSystem =
    new Path(root).getFileSystem(
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))

  /** Quantize + norm one batch of raw `(vec_id, embedding)` rows into the
    * assignment domain `(cid, qb, n2b)`. */
  def prepared(batch: DataFrame): DataFrame =
    graft.analytics.Similarity.quantizeNorm(batch)
      .select(col("vec_id").as("cid"), col("q").as("qb"), col("n2").as("n2b"))

  /** One batch against the frozen broadcast centroids → assignment rows
    * `(cid, cent_id)`. */
  def deltas(batch: DataFrame, cents: DataFrame): DataFrame =
    graft.analytics.Similarity.assignVectors(prepared(batch), cents)
      .select(col("cid"), col("cent_id"))

  // --------------------------------------------------------- delta layout

  private def assignDir(stateRoot: String) = new Path(s"$stateRoot/assign")

  private def deltaDirIds(fs: FileSystem, stateRoot: String): Seq[Long] = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .sorted
  }

  private def foldMarker(stateRoot: String) =
    new Path(assignDir(stateRoot), "_folded_through")

  /** Highest batch id whose delta rows live inside a FOLDED dir (−1 when
    * no fold has ever completed publishing). */
  private def foldedThrough(fs: FileSystem, stateRoot: String): Long = {
    val m = foldMarker(stateRoot)
    if (!fs.exists(m)) -1L
    else {
      val len = fs.getFileStatus(m).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(m)
      try in.readFully(0, buf) finally in.close()
      new String(buf).trim.toLong
    }
  }

  private def publishMarker(fs: FileSystem, stateRoot: String, v: Long): Unit = {
    val dst = foldMarker(stateRoot)
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  private def foldStaging(stateRoot: String, target: Long) =
    new Path(assignDir(stateRoot), s"_fold_v$target")

  /** Complete or discard an interrupted fold. Deterministic from on-disk
    * state alone: a staging dir WITH `_SUCCESS` and a watermark ≥ its
    * target was mid-publish — finish it (delete originals ≤ target,
    * rename staging into place); anything else is pre-publish garbage —
    * the originals are intact, so drop the staging dir. */
  private def recoverFold(fs: FileSystem, stateRoot: String): Unit = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) return
    fs.listStatus(d)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_fold_v"))
      .foreach { st =>
        val target = st.getPath.getName.stripPrefix("_fold_v").toLong
        val complete = fs.exists(new Path(st.getPath, "_SUCCESS"))
        if (complete && foldedThrough(fs, stateRoot) >= target)
          finalizeFold(fs, stateRoot, target)
        else
          fs.delete(st.getPath, true)
      }
  }

  /** Publish a complete staging dir: delete every original `batch=<id>`
    * dir at or below the target (the staged union contains their rows),
    * then rename the staging dir to `batch=<target>`. Idempotent — safe
    * to re-run after a crash at any step. */
  private def finalizeFold(fs: FileSystem, stateRoot: String, target: Long): Unit = {
    deltaDirIds(fs, stateRoot).filter(_ <= target).foreach { id =>
      fs.delete(new Path(assignDir(stateRoot), s"batch=$id"), true)
    }
    val staging = foldStaging(stateRoot, target)
    if (fs.exists(staging) &&
      !fs.rename(staging, new Path(assignDir(stateRoot), s"batch=$target")))
      throw new java.io.IOException(s"fold rename failed for $staging")
  }

  /** Fold the older half of the delta dirs into one when the count
    * exceeds the bound. Cost ∝ folded-delta bytes (never the corpus; the
    * newest half stays untouched, so a given row is re-folded O(log)
    * times over the store's life). Runs inside `merge` — a concurrent
    * `assignments` read during the publish step may see a torn view, the
    * usual caveat for any non-snapshot directory read. */
  private def maybeCompact(spark: SparkSession, stateRoot: String,
      fs: FileSystem): Unit = {
    val maxDirs = spark.conf.getOption(MaxDeltaDirsKey).map(_.toInt).getOrElse(16)
    val ids = deltaDirIds(fs, stateRoot)
    if (ids.size <= maxDirs) return
    val folds = ids.dropRight(math.max(1, maxDirs / 2))
    if (folds.size < 2) return
    val target = folds.last
    val staging = foldStaging(stateRoot, target)
    spark.read.parquet(
        folds.map(id => s"$stateRoot/assign/batch=$id"): _*)
      .select(col("cid"), col("cent_id"))
      .write.mode("overwrite").parquet(staging.toString)
    publishMarker(fs, stateRoot, target)
    finalizeFold(fs, stateRoot, target)
  }

  // ---------------------------------------------------------------- merge

  /** Apply one micro-batch: write the assignment delta (idempotent by
    * batch directory) and merge the per-cell counts (additive). Write
    * completion is judged by the committer's `_SUCCESS` marker, not bare
    * directory existence — a crash mid-write leaves a partial
    * `batch=<id>` dir, and the replay must repair it (mode("overwrite")
    * clears the torn files), or the assignment index would silently miss
    * the batch the cell counts include. A batch at or below the fold
    * watermark is already inside a folded dir — rewriting its delta
    * would double its rows, so the watermark check comes first. */
  def merge(batch: DataFrame, cents: DataFrame, batchId: Long,
      stateRoot: String): Unit = {
    val spark = batch.sparkSession
    val fs = fsFor(stateRoot)
    recoverFold(fs, stateRoot)
    val batchDir = new Path(assignDir(stateRoot), s"batch=$batchId")
    val deltaComplete = batchId <= foldedThrough(fs, stateRoot) ||
      fs.exists(new Path(batchDir, "_SUCCESS"))
    if (batchId <= SnapshotStore.lastBatchId(s"$stateRoot/cells") &&
      deltaComplete) return // replayed batch
    val d = deltas(batch, cents).persist()
    try {
      if (!deltaComplete)
        d.write.mode("overwrite").parquet(batchDir.toString)
      if (batchId > SnapshotStore.lastBatchId(s"$stateRoot/cells")) {
        val counts = d.groupBy(col("cent_id")).agg(count(lit(1)).as("n_vectors"))
        val merged = SnapshotStore.read(spark, s"$stateRoot/cells")
          .fold(counts)(_.unionByName(counts)
            .groupBy(col("cent_id")).agg(sum(col("n_vectors")).as("n_vectors")))
        SnapshotStore.writeNext(merged, s"$stateRoot/cells", Some(batchId))
      }
      maybeCompact(spark, stateRoot, fs)
    } finally d.unpersist()
  }

  /** The full maintained assignment index: union of the batch deltas —
    * empty (same schema) before the first batch lands, like
    * [[balanceView]]. */
  def assignments(spark: SparkSession, stateRoot: String): DataFrame = {
    val fs = fsFor(stateRoot)
    if (deltaDirIds(fs, stateRoot).isEmpty)
      spark.emptyDataFrame
        .select(lit(0L).as("cid"), lit(0L).as("cent_id")).limit(0)
    else spark.read.parquet(s"$stateRoot/assign")
  }

  /** The live s20 cell-balance report over everything arrived so far —
    * cell-count-sized compute off the k-row state, never a corpus scan. */
  def balanceView(spark: SparkSession, stateRoot: String): DataFrame = {
    val counts = SnapshotStore.read(spark, s"$stateRoot/cells")
      .getOrElse(spark.emptyDataFrame.select(lit(0L).as("cent_id"),
        lit(0L).as("n_vectors")).limit(0))
    val total = counts.agg(sum(col("n_vectors")).as("total"),
      count(lit(1)).as("n_cells"))
    counts.crossJoin(broadcast(total))
      .select(col("cent_id"), col("n_vectors"),
        // decimal(38,0) intermediate — the bare Long product wraps at the
        // ~1e12-vector design point (see s20 in Similarity.scala)
        expr("cast(n_vectors as decimal(38,0)) * n_cells * 1000000 div total")
          .as("load_ppm_of_mean"))
      .orderBy(col("cent_id"))
  }

  /** Start the streaming maintainer over a raw embedding stream. */
  def start(vecs: DataFrame, cents: DataFrame, stateRoot: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        merge(batch, cents, id, stateRoot)
      }
      .start()
}
