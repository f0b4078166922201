package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned parquet snapshot directory — the crash-safe read-merge-write
  * pattern shared by the current-state materializer (`CurrentState`), the
  * SCD-2 history, and the Incremental* view maintainers.
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
  *
  * == Bucketed writes (the 100 TB state layer) ==
  *
  * `writeNext` rewrites the full snapshot — O(state) per batch, fine for
  * O(k)-sized state (sketches, centroids, top-k heaps) but a scale-killer
  * for corpus-proportional state (per-key current rows, component labels,
  * per-user-hour observations). `writeNextBucketed` is the MERGE-INTO
  * shape: rows hash into `numBuckets` buckets on the store's key columns,
  * a batch physically writes ONLY the buckets its touched keys hash into
  * (`v=<N>/__graft_bucket=<K>/`), and a `_MANIFEST` inside the version dir
  * maps every live bucket to the version dir holding its newest data —
  * untouched buckets keep pointing at the older version. Readers resolve
  * the newest complete version's manifest, so the logical snapshot is
  * always whole while the per-batch write cost is ∝ touched buckets, not
  * ∝ state. The `_MANIFEST` is written BEFORE `_COMMIT` inside the same
  * version dir, so the commit marker remains the single commit point: an
  * uncommitted version (manifest and all) is invisible, and retention
  * keeps every version dir a surviving manifest still references.
  */
private[graft] object SnapshotStore {

  /** Internal partition column for bucketed versions; `partitionBy` strips
    * it from the data files, and manifest reads address the leaf dirs
    * directly so it is never re-inferred into the schema. */
  val BucketCol = "__graft_bucket"

  /** Bucketing contract for one store: the key columns rows hash on and
    * the bucket count. The bucket count is a layout property — changing it
    * (or the key columns) forces one full rewrite on the next write, after
    * which incremental writes resume under the new layout. */
  final case class Buckets(keyCols: Seq[String], num: Int)

  /** Conf key for the default bucket count (specs shrink it to make
    * per-bucket assertions cheap; a cluster deployment sizes it so a
    * bucket ≲ an executor's comfortable write quantum). */
  val BucketsConfKey = "spark.graft.snapshot.buckets"

  def bucketsFor(spark: SparkSession, keyCols: Seq[String]): Buckets =
    Buckets(keyCols, spark.conf.getOption(BucketsConfKey).map(_.toInt).getOrElse(32))

  private def bucketExpr(keyCols: Seq[String], num: Int): Column =
    pmod(hash(keyCols.map(col): _*), lit(num))

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

  // ---------------------------------------------------------------- manifest

  /** Bucket manifest of one version dir: layout params + the store schema
    * (for empty-state reads) + the bucket → hosting-version map. */
  private[streaming] final case class Manifest(
      keyCols: Seq[String], num: Int, schemaJson: String, buckets: Map[Int, Long])

  private def manifestFile(versionDir: java.io.File) =
    new java.io.File(versionDir, "_MANIFEST")

  /** Line format (schema json is single-line by construction):
    * `num\nkeyCols-csv\nschema-json\nb v\nb v…` */
  private def writeManifest(versionDir: java.io.File, m: Manifest): Unit = {
    val body = (Seq(m.num.toString, m.keyCols.mkString(","), m.schemaJson) ++
      m.buckets.toSeq.sorted.map { case (b, v) => s"$b $v" }).mkString("\n")
    java.nio.file.Files.write(manifestFile(versionDir).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private[streaming] def manifest(versionDir: java.io.File): Option[Manifest] = {
    val f = manifestFile(versionDir)
    if (!f.isFile) None
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
      val keyCols = lines(1).split(",").toSeq.filter(_.nonEmpty)
      val buckets = lines.drop(3).filter(_.nonEmpty).map { l =>
        val Array(b, v) = l.split(" ")
        b.toInt -> v.toLong
      }.toMap
      Some(Manifest(keyCols, lines.head.toInt, lines(2), buckets))
    }
  }

  private def currentManifest(root: String): Option[(Long, Manifest)] =
    versions(root).lastOption.flatMap(v =>
      manifest(new java.io.File(s"$root/v=$v")).map(v -> _))

  /** The physical paths holding the CURRENT snapshot's data — one `v=<N>`
    * dir for a flat store, the manifest-resolved bucket leaf dirs for a
    * bucketed one. Shape specs assert a merge plan scans exactly these
    * (per-batch read cost must not grow with the store's history). */
  def livePaths(root: String): Seq[String] =
    versions(root).lastOption.toSeq.flatMap { v =>
      manifest(new java.io.File(s"$root/v=$v")) match {
        case Some(m) => m.buckets.toSeq.sorted.map { case (b, bv) =>
          s"$root/v=$bv/$BucketCol=$b" }
        case None => Seq(s"$root/v=$v")
      }
    }

  // ------------------------------------------------------------------- read

  /** The current (= highest COMPLETE) snapshot, if any. A bucketed version
    * reads through its manifest (bucket dirs may live in older version
    * dirs); an empty bucketed store yields an empty frame with the
    * manifest's recorded schema. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    readPruned(spark, root, None)

  /** The distinct bucket ids `touchedKeys` (columns = `buckets.keyCols`)
    * hash into — at most `buckets.num` driver values. Compute ONCE per
    * batch and share between [[readTouched]] and [[writeNextBuckets]] so
    * the read prune and the write set agree by construction. */
  def bucketIds(touchedKeys: DataFrame, buckets: Buckets): Set[Int] =
    touchedKeys.select(bucketExpr(buckets.keyCols, buckets.num).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** The current snapshot RESTRICTED to the given buckets, reading only
    * those buckets' dirs — the partition-pruned lookup a MERGE INTO does:
    * a batch's merge plan only needs the touched buckets' rows (it writes
    * only those buckets; the manifest carries the rest forward untouched),
    * so per-batch READ cost is ∝ touched buckets too, not ∝ state.
    * Falls back to the FULL snapshot when the store has no compatible
    * manifest (flat store, changed layout) — exactly the condition under
    * which [[writeNextBuckets]] full-rewrites, so read and write always
    * agree on scope. */
  def readTouched(spark: SparkSession, root: String, buckets: Buckets,
      touched: Set[Int]): Option[DataFrame] =
    currentManifest(root).map(_._2)
      .filter(m => m.num == buckets.num && m.keyCols == buckets.keyCols) match {
      case Some(_) => readPruned(spark, root, Some(touched))
      case None => read(spark, root)
    }

  private def readPruned(spark: SparkSession, root: String,
      only: Option[Set[Int]]): Option[DataFrame] =
    versions(root).lastOption.map { v =>
      manifest(new java.io.File(s"$root/v=$v")) match {
        case Some(m) =>
          val live = only match {
            case Some(ts) => m.buckets.filter { case (b, _) => ts(b) }
            case None => m.buckets
          }
          if (live.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
          else
            spark.read.parquet(live.toSeq.sorted.map { case (b, bv) =>
              s"$root/v=$bv/$BucketCol=$b" }: _*)
        case None => spark.read.parquet(s"$root/v=$v")
      }
    }

  /** Batch id recorded with the current snapshot (−1 when none, and −1 for
    * a migrated pre-_COMMIT snapshot — its producing batch is unknown, so
    * replayed batches re-merge, the safe direction for idempotent merges). */
  def lastBatchId(root: String): Long =
    versions(root).lastOption.map { v =>
      val f = new java.io.File(s"$root/v=$v", "_COMMIT")
      if (!f.isFile) -1L
      else new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
    }.getOrElse(-1L)

  // ------------------------------------------------------------------ write

  /** First write into a legacy store: ADOPT its _SUCCESS-only versions by
    * stamping _COMMIT(−1) into them (idempotent), THEN drop the _FORMAT
    * marker. Legacy means NO _COMMIT anywhere (mirroring versions()'s
    * read-path test): a store that already has any _COMMIT was written by
    * marker-aware code, so its _SUCCESS-only dirs are crash leftovers of
    * interrupted commits — adopting those as committed would surface a
    * snapshot with batch id −1 and let a replayed delta-applying merge
    * re-apply deltas it already contains. Stamp NEWEST FIRST: the first
    * stamped _COMMIT flips versions() to the new-format branch, so if the
    * CURRENT version were stamped last a crash mid-adoption would leave
    * readers on a stale older snapshot; newest-first means any partial
    * adoption still surfaces the current version. */
  private def ensureFormat(root: String): Unit =
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

  /** Single commit point: tmp write + atomic rename, id inside the marker. */
  private def commit(root: String, version: Long, batchId: Option[Long]): Unit = {
    val dir = java.nio.file.Paths.get(s"$root/v=$version")
    val tmp = dir.resolve("_COMMIT.tmp")
    java.nio.file.Files.write(tmp, batchId.getOrElse(-1L).toString.getBytes)
    java.nio.file.Files.move(tmp, dir.resolve("_COMMIT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  /** Retention: keep the two highest COMPLETE versions (current + the
    * crash-recovery fallback) plus every version dir either of their
    * manifests still references; delete the rest (older completes and
    * partial leftovers). Within surviving BUCKETED versions, prune bucket
    * dirs neither kept manifest references — storage stays ∝ 2× live
    * state instead of accreting superseded buckets. The version just
    * written is complete, so the newest snapshot can never be deleted. */
  private def retain(root: String): Unit = {
    val top = versions(root).takeRight(2)
    val manifests: Seq[Manifest] =
      top.flatMap(v => manifest(new java.io.File(s"$root/v=$v")))
    val keep = top.toSet ++ manifests.flatMap(_.buckets.values)
    versionDirs(root).filterNot { case (v, _) => keep(v) }
      .foreach { case (_, dir) => rm(dir) }
    // referenced (bucket, version) pairs across the kept manifests — built
    // from a Seq, NOT a Map keyed by bucket id: the same bucket is live in
    // TWO versions when current and fallback disagree on it
    val liveBuckets: Set[(Int, Long)] =
      manifests.flatMap(_.buckets.map { case (b, bv) => (b, bv) }).toSet
    versionDirs(root).foreach { case (v, dir) =>
      // only prune inside versions that ARE bucketed (flat dirs hold one
      // indivisible snapshot) and only when some manifest still governs them
      if (manifestFile(dir).isFile)
        dir.listFiles().filter(_.getName.startsWith(s"$BucketCol="))
          .foreach { bd =>
            val b = bd.getName.stripPrefix(s"$BucketCol=").toInt
            if (!liveBuckets((b, v))) rm(bd)
          }
    }
  }

  /** Write `df` as the next version — FULL rewrite (O(state) per call).
    * Right for O(k)-sized state (sketches, centroids, capped top-k); use
    * [[writeNextBucketed]] for corpus-proportional state. */
  def writeNext(df: DataFrame, root: String, batchId: Option[Long] = None): Unit = {
    ensureFormat(root)
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    commit(root, next, batchId)
    retain(root)
  }

  /** Write `df` (the WHOLE merged snapshot frame — untouched rows unioned
    * through, as every maintainer's merge plan already produces) but
    * physically materialize ONLY the buckets that `touchedKeys` hash into;
    * untouched buckets stay in their current version dirs, re-referenced
    * by the new manifest. Bytes written per batch ∝ touched buckets.
    *
    * `touchedKeys` must carry exactly `buckets.keyCols` columns and cover
    * every key whose row differs from the previous snapshot (supersets are
    * safe — they only widen the write). `None`, a missing/incompatible
    * previous manifest (flat store, changed bucket count or key columns),
    * or a first write all force one full rewrite, after which incremental
    * writes resume. A SCHEMA change also requires one full rewrite (pass
    * `None`): incremental writes would otherwise mix old-schema untouched
    * buckets with new-schema touched ones under a single multi-path read.
    *
    * Crash window: identical to [[writeNext]] — the manifest lives INSIDE
    * the uncommitted version dir and only becomes visible with `_COMMIT`,
    * so a crash anywhere before the marker rename leaves readers on the
    * previous complete version and its manifest. */
  def writeNextBucketed(df: DataFrame, root: String, batchId: Option[Long],
      buckets: Buckets, touchedKeys: Option[DataFrame]): Unit =
    writeNextBuckets(df, root, batchId, buckets,
      touchedKeys.map(tk => bucketIds(tk, buckets)))

  /** [[writeNextBucketed]] with the touched-bucket set precomputed (via
    * [[bucketIds]]) — the form the read-pruned merge path uses, so one
    * driver-side set drives both the snapshot read prune and the write. */
  def writeNextBuckets(df: DataFrame, root: String, batchId: Option[Long],
      buckets: Buckets, touchedBuckets: Option[Set[Int]]): Unit = {
    ensureFormat(root)
    val prev = currentManifest(root).map(_._2)
      .filter(m => m.num == buckets.num && m.keyCols == buckets.keyCols)
    val schemaJson = df.schema.json
    val touched: Option[Set[Int]] =
      if (prev.isDefined) touchedBuckets else None // no manifest: full rewrite
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    val withB = df.withColumn(BucketCol, bucketExpr(buckets.keyCols, buckets.num))
    val out = touched match {
      case Some(ts) => withB.filter(col(BucketCol).isin(ts.toSeq.map(Int.box): _*))
      case None => withB
    }
    out.write.mode("overwrite").partitionBy(BucketCol).parquet(s"$root/v=$next")
    // which touched buckets actually produced rows (a touched bucket whose
    // every row vanished gets no dir — it must leave the manifest too)
    val written = Option(new java.io.File(s"$root/v=$next").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$BucketCol="))
      .map(_.getName.stripPrefix(s"$BucketCol=").toInt).toSet
    val newMap = touched match {
      case Some(ts) =>
        prev.get.buckets -- ts ++ written.map(_ -> next)
      case None => written.map(_ -> next).toMap
    }
    writeManifest(new java.io.File(s"$root/v=$next"),
      Manifest(buckets.keyCols, buckets.num, schemaJson, newMap))
    commit(root, next, batchId)
    retain(root)
  }
}
