package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet snapshot directory — the crash-safe read-merge-write
  * pattern shared by the current-state materializer (`CurrentState`) and
  * the incremental aggregate view (`IncrementalAgg`).
  *
  * Layout: `<root>/v=<N>/` parquet dirs; a version counts only once its
  * `_SUCCESS` marker exists (a crash mid-write leaves a partial dir that
  * must never be read as state). Optionally a `_BATCHID` file records the
  * streaming batch that produced the version, which is what makes a
  * non-idempotent (delta-applying) merge exactly-once under foreachBatch
  * replays: a replayed batch id ≤ the recorded one is skipped.
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
    new java.io.File(dir, "_SUCCESS").isFile

  def versions(root: String): Seq[Long] =
    versionDirs(root).collect { case (v, f) if isComplete(f) => v }

  /** The current (= highest COMPLETE) snapshot, if any. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    versions(root).lastOption.map(v => spark.read.parquet(s"$root/v=$v"))

  /** Batch id recorded with the current snapshot (−1 when none). */
  def lastBatchId(root: String): Long =
    versions(root).lastOption.map { v =>
      val f = new java.io.File(s"$root/v=$v", "_BATCHID")
      if (f.isFile) new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
      else -1L
    }.getOrElse(-1L)

  /** Write `df` as the next version (optionally stamping the producing
    * batch id), then retain only the two highest complete versions —
    * current + the crash-recovery fallback; partial leftovers and older
    * completes are deleted. The version just written is complete, so the
    * newest snapshot can never be deleted. */
  def writeNext(df: DataFrame, root: String, batchId: Option[Long] = None): Unit = {
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    batchId.foreach { id =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/v=$next", "_BATCHID"),
        id.toString.getBytes)
    }
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
