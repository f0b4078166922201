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
  * Delta dirs are COMPACTED in two tiers so the directory count stays
  * bounded WITHOUT refolding all history every cycle: past
  * `spark.graft.ivf.assign.maxDeltaDirs` (default 16) raw batch dirs,
  * the oldest half folds into one tier-1 dir; past maxDirs/4 tier-1
  * dirs, those merge into one — amortized per-batch fold IO
  * ∝ arrived/(maxDirs²/8), never a per-batch corpus rewrite (see
  * maybeCompact). Folds are crash-safe: combined rows land in an
  * underscore-prefixed staging dir (invisible to the root parquet read)
  * with a `_FOLDS` record of exactly the dirs it replaces, the
  * `_folded_through.<seq>` LEDGER (replay watermark + live fold-dir ids;
  * versioned so a publish never deletes the live ledger before its
  * replacement is visible — readers take the max seq) publishes via
  * atomic rename BEFORE any original dir is deleted, and
  * an interrupted fold is either completed or discarded
  * deterministically on the next merge. The watermark keeps replay
  * exact: a replayed batch at or below it must NOT rewrite its (now
  * folded-away) delta dir.
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

  private val LedgerName = "_folded_through"

  /** Durable fold ledger: `through` = highest RAW batch id whose delta
    * rows live inside a folded dir (the replay guard — a batch at or
    * below it must not rewrite its delta), `folds` = the ids of the LIVE
    * fold-produced dirs (tier 1), so compaction can tell a fold dir from
    * a raw delta without refolding deep history every cycle. Marker file
    * format: line 1 = through, line 2 = space-separated fold ids (absent
    * line 2 = legacy single-value marker, parsed with no fold list). */
  private[streaming] final case class FoldState(through: Long, folds: Seq[Long])

  /** Ledger files are VERSIONED (`_folded_through.<seq>`, readers take
    * the max seq) so a publish NEVER deletes the live ledger before its
    * replacement is in place: the classic tmp-write + delete(dst) +
    * rename(dst) pattern has a crash window between the delete and the
    * rename in which the ledger is simply absent — a fresh process would
    * then read foldedThrough = −1, let a replayed already-folded batch
    * rewrite its delta dir, and double-count that batch's rows. With
    * versioned names the new ledger renames into a FRESH path (atomic,
    * nothing to delete first) and old versions are garbage-collected
    * only after the new one is durably visible. A bare legacy
    * `_folded_through` parses as seq 0. */
  private def ledgerSeq(name: String): Option[Long] =
    if (name == LedgerName) Some(0L)
    else if (name.startsWith(LedgerName + ".") && !name.endsWith(".tmp"))
      scala.util.Try(name.stripPrefix(LedgerName + ".").toLong).toOption
    else None

  private def ledgerFiles(fs: FileSystem, stateRoot: String): Seq[(Long, Path)] = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isFile)
      .flatMap(st => ledgerSeq(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1)
  }

  private def readSmall(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf)
  }

  private[streaming] def foldState(fs: FileSystem, stateRoot: String): FoldState = {
    ledgerFiles(fs, stateRoot).lastOption match {
      case None => FoldState(-1L, Seq.empty)
      case Some((_, p)) =>
        val lines = readSmall(fs, p).split("\n", -1).toSeq
        FoldState(lines.head.trim.toLong,
          lines.lift(1).map(_.trim).filter(_.nonEmpty)
            .map(_.split(" ").toSeq.map(_.toLong)).getOrElse(Seq.empty).sorted)
    }
  }

  private def foldedThrough(fs: FileSystem, stateRoot: String): Long =
    foldState(fs, stateRoot).through

  /** Ledger publish with NO absent-ledger window: write the next
    * versioned name via tmp + atomic rename (the destination is fresh, so
    * nothing is deleted before the rename), then best-effort GC of the
    * superseded versions and stray tmps. A crash at any point leaves
    * either the old ledger (pre-rename) or both (post-rename, pre-GC) —
    * readers take the max seq, so foldedThrough never regresses. */
  private def publishState(fs: FileSystem, stateRoot: String, st: FoldState): Unit = {
    val existing = ledgerFiles(fs, stateRoot)
    val seq = existing.lastOption.map(_._1).getOrElse(0L) + 1
    val dst = new Path(assignDir(stateRoot), s"$LedgerName.$seq")
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"${st.through}\n${st.folds.sorted.mkString(" ")}".getBytes)
    finally out.close()
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
    // GC only AFTER the new ledger is durably visible
    existing.foreach { case (_, p) => fs.delete(p, false) }
    fs.listStatus(assignDir(stateRoot))
      .filter(st => st.isFile && st.getPath.getName.startsWith(LedgerName + ".")
        && st.getPath.getName.endsWith(".tmp"))
      .foreach(st => fs.delete(st.getPath, false))
  }

  private def foldStaging(stateRoot: String, target: Long) =
    new Path(assignDir(stateRoot), s"_fold_v$target")

  /** The exact `batch=<id>` dirs a staged fold replaces, recorded INSIDE
    * the staging dir (after the parquet `_SUCCESS`, before the ledger
    * publish) so recovery deletes precisely the folded dirs — tiering
    * breaks the old "everything ≤ target" prefix invariant (an older
    * live fold dir may have a smaller id than a raw fold's target). */
  private def foldsFile(staging: Path) = new Path(staging, "_FOLDS")

  /** Fold the given dirs into one `batch=<max id>` dir, crash-safe:
    * staged parquet → `_FOLDS` id list → atomic ledger publish (the
    * commit point) → delete originals → rename staging into place.
    * A crash before the publish leaves the originals intact and the
    * staging dir is discarded on recovery; after it, recovery completes
    * the deletes + rename deterministically from `_FOLDS`. */
  private def foldOnce(spark: SparkSession, stateRoot: String, fs: FileSystem,
      prev: FoldState, foldSet: Seq[Long], newThrough: Long): Unit = {
    val target = foldSet.max
    val staging = foldStaging(stateRoot, target)
    spark.read.parquet(
        foldSet.map(id => s"$stateRoot/assign/batch=$id"): _*)
      .select(col("cid"), col("cent_id"))
      .write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(foldsFile(staging), true)
    try out.write(foldSet.sorted.mkString(" ").getBytes) finally out.close()
    publishState(fs, stateRoot, FoldState(math.max(prev.through, newThrough),
      prev.folds.filterNot(foldSet.contains) :+ target))
    finalizeFold(fs, stateRoot, target, foldSet)
  }

  /** Delete exactly the folded dirs, then rename the staging dir to
    * `batch=<target>`. Idempotent — safe to re-run after a crash at any
    * step (a folded dir already gone deletes as a no-op; a completed
    * rename leaves no staging dir to move). */
  private def finalizeFold(fs: FileSystem, stateRoot: String, target: Long,
      foldSet: Seq[Long]): Unit = {
    foldSet.foreach { id =>
      fs.delete(new Path(assignDir(stateRoot), s"batch=$id"), true)
    }
    val staging = foldStaging(stateRoot, target)
    if (fs.exists(staging) &&
      !fs.rename(staging, new Path(assignDir(stateRoot), s"batch=$target")))
      throw new java.io.IOException(s"fold rename failed for $staging")
  }

  /** Complete or discard an interrupted fold. Deterministic from on-disk
    * state alone: a staging dir whose target the LEDGER lists as a live
    * fold dir (and which carries `_SUCCESS` + `_FOLDS`) was mid-publish —
    * finish it by replaying the recorded deletes + rename; anything else
    * is pre-publish garbage — the originals are intact, drop the staging
    * dir.
    *
    * `gcIncomplete` distinguishes the two callers: the MAINTAINER (merge)
    * passes true and also drops pre-publish garbage; READ-ONLY consumers
    * (assignments/balanceView, possibly in a different process while a
    * maintainer is live) pass false — they still COMPLETE a published
    * fold (finalize is idempotent, and without it a crash inside
    * finalizeFold would leave the folded rows invisible: originals
    * deleted, staging still underscore-prefixed), but they must never
    * delete a staging dir a concurrent maintainer may be mid-writing. */
  private def recoverFold(fs: FileSystem, stateRoot: String,
      gcIncomplete: Boolean): Unit = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) return
    val st = foldState(fs, stateRoot)
    fs.listStatus(d)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_fold_v"))
      .foreach { s =>
        val target = s.getPath.getName.stripPrefix("_fold_v").toLong
        val complete = fs.exists(new Path(s.getPath, "_SUCCESS")) &&
          fs.exists(foldsFile(s.getPath))
        if (complete && st.folds.contains(target)) {
          val foldSet = readSmall(fs, foldsFile(s.getPath)).trim
            .split(" ").toSeq.filter(_.nonEmpty).map(_.toLong)
          finalizeFold(fs, stateRoot, target, foldSet)
        } else if (gcIncomplete)
          fs.delete(s.getPath, true)
      }
  }

  /** Two-tier compaction, so per-batch fold IO stays amortized-bounded
    * instead of refolding all history every cycle:
    *
    *  - tier 0 (raw deltas): when more than `maxDirs` raw batch dirs
    *    exist, the oldest half fold into ONE tier-1 dir — each raw row
    *    is folded here exactly once;
    *  - tier 1 (fold dirs, tracked in the ledger): when more than
    *    max(2, maxDirs/4) fold dirs accumulate, they merge into one —
    *    a row re-folds here once per ~(maxDirs/2 × maxDirs/4) batches,
    *    so amortized per-batch fold IO is ∝ arrived/(maxDirs²/8), and
    *    the re-train contract (each frozen-quantizer generation resets
    *    state) bounds the residual linear term. Deeper tiers are the
    *    same mechanical step if a deployment ever needs them.
    *
    * Total dir count stays ≤ maxDirs + max(2, maxDirs/4) + 2. The two
    * tiers are evaluated INDEPENDENTLY per merge (not if/else): at small
    * maxDirs the raw count sits above maxDirs on every batch even when
    * its foldSet is too small to act, and an else-chained tier-1 branch
    * would then be starved forever — fold dirs accreted without bound at
    * maxDirs=2 until the IvfFoldLossDrill caught it. Runs inside
    * `merge` — a concurrent `assignments` read during the publish step
    * may see a torn view, the usual caveat for any non-snapshot
    * directory read. */
  private def maybeCompact(spark: SparkSession, stateRoot: String,
      fs: FileSystem): Unit = {
    val maxDirs = spark.conf.getOption(MaxDeltaDirsKey).map(_.toInt).getOrElse(16)
    val maxFolds = math.max(2, maxDirs / 4)
    val st = foldState(fs, stateRoot)
    val ids = deltaDirIds(fs, stateRoot)
    val folds = st.folds.filter(ids.contains)
    val raws = ids.filterNot(folds.contains)
    if (raws.size > maxDirs) {
      val foldSet = raws.dropRight(math.max(2, maxDirs / 2))
      if (foldSet.size >= 2)
        foldOnce(spark, stateRoot, fs, st.copy(folds = folds), foldSet,
          newThrough = foldSet.max)
    }
    // re-read: the raw fold above may have changed the ledger/dir set
    val st2 = foldState(fs, stateRoot)
    val ids2 = deltaDirIds(fs, stateRoot)
    val folds2 = st2.folds.filter(ids2.contains)
    if (folds2.size > maxFolds)
      foldOnce(spark, stateRoot, fs, st2.copy(folds = folds2), folds2,
        newThrough = st2.through)
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
    SnapshotStore.requireAtomicRename(stateRoot) // fail BEFORE the delta write
    val fs = fsFor(stateRoot)
    recoverFold(fs, stateRoot, gcIncomplete = true)
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
    * [[balanceView]]. Completes any PUBLISHED-but-unfinalized fold first
    * (read-only recovery): a crash inside finalizeFold deletes the
    * original dirs before the staging rename, and without this a fresh
    * consumer would silently read a shrunken index. */
  def assignments(spark: SparkSession, stateRoot: String): DataFrame = {
    val fs = fsFor(stateRoot)
    recoverFold(fs, stateRoot, gcIncomplete = false)
    if (deltaDirIds(fs, stateRoot).isEmpty)
      spark.emptyDataFrame
        .select(lit(0L).as("cid"), lit(0L).as("cent_id")).limit(0)
    else spark.read.parquet(s"$stateRoot/assign")
  }

  /** The live s20 cell-balance report over everything arrived so far —
    * cell-count-sized compute off the k-row state, never a corpus scan.
    * (The cells snapshot itself is fold-independent, but a fresh
    * read-only consumer may be the first process up after a crash, so it
    * completes a published fold too — keeps the store's on-disk state
    * converging regardless of which entry point runs first.) */
  def balanceView(spark: SparkSession, stateRoot: String): DataFrame = {
    recoverFold(fsFor(stateRoot), stateRoot, gcIncomplete = false)
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
