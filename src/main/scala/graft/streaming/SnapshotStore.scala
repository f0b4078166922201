package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet snapshot directory — the crash-safe read-merge-write
  * pattern shared by the current-state materializer (`CurrentState`) and
  * the incremental aggregate view (`IncrementalAgg`).
  *
  * Layout: `<root>/v=<N>/` parquet dirs. A version counts only once its
  * `_COMMIT` marker exists — written AFTER the parquet job commits, via
  * temp-file + atomic rename, and carrying the producing streaming batch
  * id (−1 for non-streaming producers). The marker is the SINGLE commit
  * point: parquet's own `_SUCCESS` is not enough for the exactly-once
  * contract, because a crash between the parquet commit and recording the
  * batch id would otherwise leave a "complete" snapshot whose producing
  * batch is unknown — a replayed non-idempotent (delta-applying) merge
  * would then re-apply deltas the snapshot already contains. With the id
  * inside the commit marker there is no such window: either the version
  * is invisible (no `_COMMIT` — readers fall back to the previous
  * version and the replayed batch re-merges onto that consistent base)
  * or it is visible WITH its batch id and the replay is skipped.
  */
private[streaming] object SnapshotStore {

  def versionDirs(root: String): Seq[(Long, java.io.File)] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(f => f.getName.stripPrefix("v=").toLong -> f)
      .sortBy(_._1)
  }

  def isComplete(dir: java.io.File): Boolean =
    new java.io.File(dir, "_COMMIT").isFile

  /** Root-level marker: this store has been written by the _COMMIT-aware
    * code at least once. Written BEFORE the first new-format parquet job,
    * so a crash inside the very first commit window cannot be mistaken
    * for a legacy store (which would wrongly surface the half-committed
    * version via the migration fallback below). */
  private def formatMarker(root: String) = new java.io.File(root, "_FORMAT")

  def versions(root: String): Seq[Long] = {
    val dirs = versionDirs(root)
    if (dirs.exists { case (_, f) => isComplete(f) } || formatMarker(root).isFile)
      dirs.collect { case (v, f) if isComplete(f) => v }
    else
      // migration (read path): a store with no _COMMIT anywhere AND no
      // _FORMAT marker predates the marker format entirely — accept its
      // parquet _SUCCESS dirs (batch id −1, below) rather than silently
      // resetting materialized state on upgrade. Any _COMMIT or _FORMAT
      // means new-format: a _SUCCESS-only dir is an uncommitted partial,
      // and accepting it would re-open the crash window the marker closes.
      dirs.collect {
        case (v, f) if new java.io.File(f, "_SUCCESS").isFile => v
      }
  }

  /** The current (= highest COMPLETE) snapshot, if any. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    versions(root).lastOption.map(v => spark.read.parquet(s"$root/v=$v"))

  /** Batch id recorded with the current snapshot (−1 when none, and −1 for
    * a migrated pre-_COMMIT snapshot — its producing batch is unknown, so
    * replayed batches re-merge, the safe direction for idempotent merges). */
  def lastBatchId(root: String): Long =
    versions(root).lastOption.map { v =>
      val f = new java.io.File(s"$root/v=$v", "_COMMIT")
      if (!f.isFile) -1L
      else new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
    }.getOrElse(-1L)

  /** Write `df` as the next version (stamping the producing batch id into
    * the commit marker), then retain only the two highest complete
    * versions — current + the crash-recovery fallback; partial leftovers
    * and older completes are deleted. The version just written is
    * complete, so the newest snapshot can never be deleted. */
  def writeNext(df: DataFrame, root: String, batchId: Option[Long] = None): Unit = {
    // first write into a legacy store: ADOPT its _SUCCESS-only versions by
    // stamping _COMMIT(−1) into them (idempotent), THEN drop the _FORMAT
    // marker. Legacy means NO _COMMIT anywhere (mirroring versions()'s
    // read-path test): a store that already has any _COMMIT was written by
    // marker-aware code, so its _SUCCESS-only dirs are crash leftovers of
    // interrupted commits — adopting those as committed would surface a
    // snapshot with batch id −1 and let a replayed delta-applying merge
    // re-apply deltas it already contains. Stamp NEWEST FIRST: the first
    // stamped _COMMIT flips versions() to the new-format branch, so if the
    // CURRENT version were stamped last a crash mid-adoption would leave
    // readers on a stale older snapshot; newest-first means any partial
    // adoption still surfaces the current version.
    if (!formatMarker(root).isFile) {
      val dirs = versionDirs(root)
      if (!dirs.exists { case (_, f) => isComplete(f) })
        dirs.reverse.foreach { case (_, dir) =>
          if (new java.io.File(dir, "_SUCCESS").isFile &&
            !new java.io.File(dir, "_COMMIT").isFile)
            java.nio.file.Files.write(dir.toPath.resolve("_COMMIT"), "-1".getBytes)
        }
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
      java.nio.file.Files.write(formatMarker(root).toPath, Array.emptyByteArray)
    }
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    // single commit point: tmp write + atomic rename, id inside the marker
    val dir = java.nio.file.Paths.get(s"$root/v=$next")
    val tmp = dir.resolve("_COMMIT.tmp")
    java.nio.file.Files.write(tmp, batchId.getOrElse(-1L).toString.getBytes)
    java.nio.file.Files.move(tmp, dir.resolve("_COMMIT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val keep = versions(root).takeRight(2).toSet
    versionDirs(root).filterNot { case (v, _) => keep(v) }.foreach { case (_, dir) =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }
}
