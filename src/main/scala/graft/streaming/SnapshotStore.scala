package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * == Filesystem portability ==
  *
  * ALL metadata IO (version listing, `_COMMIT`/`_FORMAT`/`_MANIFEST`
  * read/write, retention deletes) goes through
  * `org.apache.hadoop.fs.FileSystem`, resolved from the root path's
  * scheme with the active session's Hadoop configuration — the same
  * resolution Spark's own parquet jobs use. A bare local path, an
  * explicit `file://` URI, and `hdfs://` all behave identically; the
  * commit-marker rename is atomic on the local filesystem and on HDFS.
  * Object stores (s3a/gs/abfs/…) get a DIFFERENT commit protocol: their
  * rename is copy+delete and not atomic, so those schemes route to the
  * object-store committer ([[ObjMode]]) — writer-unique data dirs written
  * in place, one conditional-PUT commit object, no rename anywhere on the
  * commit path — selected automatically by scheme and overridable via
  * `spark.graft.snapshot.committer` (see [[committerFor]]). The legacy
  * escape hatch `spark.graft.snapshot.allowNonAtomicRename` is now only
  * consulted when the RENAME committer is explicitly forced onto an
  * object-store scheme (see [[requireAtomicRename]]).
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
  *
  * == Single writer (enforced) ==
  *
  * Exactly ONE producer may write a store root at a time — Structured
  * Streaming guarantees this within one query (foreachBatch batches are
  * serial), but nothing stops a second query or a batch backfill from
  * pointing at the same root, and two writers that both compute
  * `next = last + 1` used to race `mode(overwrite)` jobs on the SAME
  * version dir: the slower job's delete-and-rewrite could destroy the
  * faster writer's already-committed data. The write path therefore never
  * writes a version dir in place: the parquet job (and manifest) lands in
  * a writer-unique `_staging_v=<N>.<uuid>` dir carrying a `_WRITER.<uuid>`
  * token, and publication is a single exclusive rename to `v=<N>` —
  * pre-checked, post-verified by the token (so a filesystem that renames
  * INTO an existing dir is caught too), and failed CLOSED with a
  * concurrent-writer error while the winner's data stays untouched. The
  * `_COMMIT` publish is itself exclusive (never overwrites an existing
  * marker) and monotonic (refuses to commit at-or-below an already
  * committed version), so an interleaving that slips past the dir rename
  * still fails loudly instead of committing a lost update. Crash-leftover
  * staging dirs are invisible to readers (no `v=` prefix) and swept by
  * the next successful write's retention pass. What enforcement CANNOT
  * recover is the violating writer's batch itself: its merge was computed
  * against a base another writer has since advanced, so after the loud
  * failure the caller must re-merge — the contract is one writer per
  * root, and the enforcement exists to make violations fail, not work.
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

  // ---------------------------------------------------------- scheme gate

  /** Filesystem schemes whose rename is copy+delete (or otherwise not the
    * single atomic metadata operation the RENAME committer's `_COMMIT`
    * publish relies on). Conservative, by scheme string — checked BEFORE
    * any FileSystem resolution so a refusal is a clear contract error, not
    * a classpath/credential failure. These schemes route to the OBJECT
    * committer by default (see [[committerFor]]), which needs no rename on
    * its commit path; the gate below only fires when the rename committer
    * is explicitly forced onto one of them. `objsim` is the offline
    * simulation ([[ObjStoreSimFs]]) and gets the same treatment as the
    * real stores so the selection logic is exercised end-to-end. */
  private[streaming] val NonAtomicRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss",
    "cos", "cosn", "swift", ObjStoreSimFs.Scheme, ObjStoreSimFs.WeakScheme)

  /** Conf escape hatch for deployments that accept the narrowed-but-open
    * crash window on object stores (e.g. a dev bucket): the exactly-once
    * contract is then best-effort, exactly as the class doc describes. */
  val AllowNonAtomicRenameKey = "spark.graft.snapshot.allowNonAtomicRename"

  /** Fail-fast gate: refuse RENAME-committer writes on a scheme whose
    * rename is non-atomic, unless [[AllowNonAtomicRenameKey]] is
    * explicitly set. Reads are unaffected (a reader cannot tear the
    * store). SnapshotStore itself only reaches this gate when the rename
    * committer is FORCED onto an object-store scheme (auto mode routes
    * those schemes to the object committer, which is gated instead on
    * [[requireExclusiveCreate]] — its commit path needs no rename). */
  def requireAtomicRename(root: String): Unit = {
    val scheme = schemeOf(root)
    if (NonAtomicRenameSchemes(scheme)) {
      val allowed = activeConf(AllowNonAtomicRenameKey)
        .exists(_.trim.equalsIgnoreCase("true"))
      require(allowed,
        s"state root '$root' resolves to object-store scheme '$scheme' " +
          "whose rename is not atomic — the _COMMIT/ledger publish cannot " +
          "guarantee exactly-once there. Point the state root at HDFS or " +
          s"a posix filesystem, use the object-store committer " +
          s"($CommitterConfKey=object, the default for this scheme), or " +
          s"set $AllowNonAtomicRenameKey=true to accept the documented " +
          "crash window (SnapshotStore class doc).")
    }
  }

  private def schemeOf(root: String): String =
    Option(new Path(root).toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")

  // ------------------------------------------- conditional-create capability

  /** Path-capability name a `FileSystem` can advertise to declare that
    * `create(path, overwrite=false)` is an ATOMIC exclusive-create arbiter
    * (a true If-None-Match conditional PUT), not a HEAD-then-PUT pre-check.
    * [[ObjStoreSimFs]] advertises it (its exclusive create publishes via
    * an atomic hard link); a store-side connector with genuine conditional
    * writes can advertise either this name or the generic probe below. */
  val ConditionalCreateCapability = "fs.capability.graft.conditional-create"

  /** Capability names probed (in order) before refusing an object-store
    * root: the graft-specific name above plus a generic spelling a future
    * Hadoop conditional-create capability may publish. `hasPathCapability`
    * returns false for names a FileSystem does not recognize, so probing
    * is safe on any connector. */
  private val ConditionalCreateProbes =
    Seq(ConditionalCreateCapability, "fs.capability.create.conditional")

  /** Conf acknowledging a deployment whose FileSystem provides atomic
    * exclusive-create but does not advertise it as a path capability
    * (e.g. a Hadoop build with S3 conditional-write support predating a
    * probe-recognized capability name). Setting it on a FileSystem whose
    * `create(overwrite=false)` is really check-then-act re-opens the
    * narrow two-concurrent-writer window the arbiter exists to close —
    * the single-writer contract then rests on deployment discipline. */
  val AssumeConditionalCreateKey = "spark.graft.snapshot.assumeConditionalCreate"

  /** Filesystems whose exclusive create is atomic by construction: a posix
    * local create and an HDFS namenode create are single metadata ops (the
    * local-scheme caveat — two same-host JVMs racing through the Hadoop
    * local FS wrapper — is out of scope, since rename is the default
    * committer there and the drills' kill/restart never run two writers
    * concurrently). */
  private val SchemesWithAtomicCreate = Set("file", "hdfs", "viewfs")

  /** Conf key (default true) for the one-time per-root exclusive-create
    * PROBE that backs the scheme whitelist above with a measured fact
    * (r16 verdict task 4): a `file://` root on a filesystem with weak
    * O_EXCL semantics (historic NFS, a permissive FUSE layer) would pass
    * the static scheme gate while the rename/create arbiter assumption
    * silently degrades. The probe creates a dotfile exclusively and
    * requires a SECOND exclusive create of the same name to FAIL — the
    * cheapest observable consequence of real exclusive-create semantics.
    * (A sequential double-create cannot distinguish an atomic arbiter
    * from a check-then-act emulation — only a true race can — so the
    * probe catches filesystems that do not arbitrate AT ALL, the failure
    * class the whitelist was silently trusting; check-then-act object
    * schemes are still handled by the capability path below.) */
  val ProbeCreateKey = "spark.graft.snapshot.probeCreate"

  /** Roots whose probe already passed (or was explicitly waived) in this
    * JVM — the probe is a measurement of the FILESYSTEM, once per root. */
  private val probedRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-time probe: true iff a second exclusive create of an existing
    * name fails. Self-cleaning (the probe file is deleted on every exit
    * path; stale siblings from a killed probe are swept first — they are
    * dotfiles, invisible to readers and residue checks either way). */
  private[streaming] def probeExclusiveCreate(fs: FileSystem, root: String): Boolean = {
    val dir = new Path(root)
    fs.mkdirs(dir)
    scala.util.Try {
      fs.globStatus(new Path(dir, ".graft_probe_create_*"))
        .foreach(st => fs.delete(st.getPath, false))
    }
    val p = new Path(dir,
      s".graft_probe_create_${java.util.UUID.randomUUID().toString.take(12)}")
    try {
      val out = fs.create(p, false)
      out.close()
      val secondSucceeded =
        try { val o2 = fs.create(p, false); o2.close(); true }
        catch { case _: java.io.IOException => false } // both FAEE types are IOE
      !secondSucceeded
    } finally scala.util.Try(fs.delete(p, false))
  }

  /** Fail-fast gate for every commit path whose single commit point is
    * [[createExclusive]] (the object committer's `c=<N>` publish and
    * [[IncrementalIvf]]'s fold-ledger publish): the protocol is only
    * exactly-once if `FileSystem.create(dst, overwrite=false)` is an
    * atomic arbiter. Classic Hadoop S3A implements `overwrite=false` as a
    * HEAD pre-check — check-then-act, which NARROWS but does not close the
    * two-writer window — so object schemes must either advertise a
    * conditional-create path capability ([[ConditionalCreateCapability]])
    * or be explicitly acknowledged via [[AssumeConditionalCreateKey]].
    * [[SchemesWithAtomicCreate]] passes because both commit paths are
    * SCHEME-MATCHED: on posix/HDFS they publish via
    * [[publishSmallExclusive]] (tmp + exclusive rename — the arbiter AND
    * the torn-proof form there), never via a bare create-at-final-name. */
  def requireExclusiveCreate(root: String): Unit = {
    val scheme = schemeOf(root)
    if (SchemesWithAtomicCreate(scheme)) {
      // static trust, turned into a measured fact once per root per JVM
      // (r16 verdict task 4): a whitelisted scheme backed by a filesystem
      // whose create(overwrite=false) silently overwrites is refused
      // unless the deployment explicitly acknowledges it
      val probeOn = activeConf(ProbeCreateKey)
        .forall(!_.trim.equalsIgnoreCase("false")) // default ON
      if (probeOn && !probedRoots.contains(root)) {
        val exclusive = probeExclusiveCreate(fsFor(root), root)
        if (!exclusive) {
          val assumed = activeConf(AssumeConditionalCreateKey)
            .exists(_.trim.equalsIgnoreCase("true"))
          require(assumed,
            s"state root '$root' (scheme '$scheme') FAILED the exclusive-" +
              "create probe: a second create(path, overwrite=false) of an " +
              "existing name SUCCEEDED, so this filesystem does not " +
              "arbitrate exclusive creates at all (weak O_EXCL — historic " +
              "NFS, permissive FUSE). The commit protocol's publish " +
              "primitives rely on that arbitration; move the state root " +
              s"to a compliant filesystem, or set " +
              s"$AssumeConditionalCreateKey=true to acknowledge the risk " +
              s"(or $ProbeCreateKey=false to skip probing).")
        }
        probedRoots.add(root)
      }
      return
    }
    val capable = scala.util.Try {
      fsFor(root).hasPathCapability(new Path(root), ConditionalCreateProbes.head) ||
        ConditionalCreateProbes.tail.exists(c =>
          fsFor(root).hasPathCapability(new Path(root), c))
    }.getOrElse(false)
    if (!capable) {
      val assumed = activeConf(AssumeConditionalCreateKey)
        .exists(_.trim.equalsIgnoreCase("true"))
      require(assumed,
        s"state root '$root' (scheme '$scheme') does not advertise atomic " +
          "exclusive-create: the commit protocol's single commit point is " +
          "FileSystem.create(path, overwrite=false) and requires a true " +
          "If-None-Match conditional PUT (HDFS namenode create, S3 " +
          "conditional writes) — a HEAD-then-PUT emulation (classic S3A) " +
          "leaves a two-writer race window. Run on a connector advertising " +
          s"'$ConditionalCreateCapability' (or " +
          s"'${ConditionalCreateProbes(1)}'), or set " +
          s"$AssumeConditionalCreateKey=true to acknowledge the FileSystem " +
          "provides it without advertising (SnapshotStore class doc).")
    }
  }

  private def activeConf(key: String): Option[String] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(key))

  // ------------------------------------------------------ committer choice

  /** Conf override for the write-path commit protocol: `object` (data dirs
    * published by a create-exclusive commit OBJECT, no rename anywhere on
    * the commit path — the object-store protocol), `rename` (the staged
    * exclusive-rename protocol, the default on rename-atomic filesystems),
    * or unset = auto: follow the root's existing layout, else pick by
    * scheme. Forcing a committer that contradicts a root's existing layout
    * fails loudly — there is no silent migration between protocols. */
  val CommitterConfKey = "spark.graft.snapshot.committer"

  /** Resolve which commit protocol WRITES to `root` use. Reads never
    * consult this — the read path detects the layout from disk (a root
    * with commit objects is object-layout, anything else is
    * version-dir-layout), so any reader can read any store. */
  private[streaming] def committerFor(root: String): String = {
    val forced = activeConf(CommitterConfKey).map(_.trim.toLowerCase(java.util.Locale.ROOT))
    forced.foreach(f => require(f == "object" || f == "rename",
      s"$CommitterConfKey must be 'object' or 'rename', got '$f'"))
    // layout detection is best-effort: an unresolvable filesystem (e.g. a
    // cloud scheme without its connector on the classpath) must surface as
    // the CHOSEN committer's own clear error (the rename gate's contract
    // message, or the object write's connector error), not as a classpath
    // failure inside this probe
    val layout: Option[String] = scala.util.Try {
      if (ObjMode.commitFiles(root).nonEmpty) Some("object")
      else {
        val fs = fsFor(root)
        if (versionDirs(root).nonEmpty || fs.exists(formatMarker(root)))
          Some("rename")
        else None
      }
    }.toOption.flatten
    (forced, layout) match {
      case (Some(f), Some(l)) if f != l => throw new IllegalStateException(
        s"store root '$root' already has $l-committer layout but " +
          s"$CommitterConfKey forces '$f' — protocols cannot be mixed on " +
          "one root; rebuild the store (or drop the conf) to switch")
      case (Some(f), _) => f
      case (None, Some(l)) => l
      case (None, None) =>
        if (NonAtomicRenameSchemes(schemeOf(root))) "object" else "rename"
    }
  }

  // ------------------------------------------------------------- hadoop fs

  /** Hadoop conf for metadata IO — the active session's (so `fs.*` confs,
    * credentials, and scheme→impl bindings match what the parquet jobs
    * use), falling back to a bare Configuration off the driver. */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** FileSystem for `root`, resolved from the path's scheme — a bare
    * local path, `file://`, and `hdfs://` all route correctly. */
  private def fsFor(root: String): FileSystem =
    new Path(root).getFileSystem(hadoopConf)

  private def writeSmall(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def readSmall(fs: FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  /** Atomic-rename publish of a small marker file: tmp write + rename.
    * Atomic on local FS and HDFS; see the S3A caveat in the class doc. */
  private def publishSmall(fs: FileSystem, dst: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    writeSmall(fs, tmp, bytes)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  /** Whether `root`'s scheme is an object store (non-atomic rename,
    * atomic all-or-nothing PUT) — the selector between the two exclusive
    * small-object publish primitives: [[createExclusive]] is torn-proof
    * there (an object appears only complete), while on posix/HDFS a
    * create is NOT atomic-at-close and the tmp + exclusive-rename form
    * ([[publishSmallExclusive]]) is the torn-proof one. */
  private[streaming] def isObjectScheme(root: String): Boolean =
    NonAtomicRenameSchemes(schemeOf(root))

  /** [[publishSmall]] but EXCLUSIVE: refuses to replace an existing `dst`.
    * Used for `_COMMIT` markers, where an existing marker means another
    * writer committed this version first — overwriting would silently
    * adopt a version whose parquet contents are not this writer's. */
  private[streaming] def publishSmallExclusive(fs: FileSystem, dst: Path,
      bytes: Array[Byte]): Unit = {
    if (fs.exists(dst))
      throw new ConcurrentWriterException(
        s"$dst already exists — another writer committed this version")
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    writeSmall(fs, tmp, bytes)
    // FileContext.rename WITHOUT Options.Rename.OVERWRITE: atomic AND
    // exclusive on local FS and HDFS — the arbiter if two committers pass
    // the exists() pre-check together
    try org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, hadoopConf)
      .rename(tmp, dst)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        throw new ConcurrentWriterException(
          s"$dst was committed by another writer during publish", e)
    }
  }

  /** Atomic CREATE-EXCLUSIVE publish of a small object — the object-store
    * committer's commit primitive: one conditional PUT (If-None-Match),
    * no tmp file, no rename. `FileSystem.create(dst, overwrite=false)` is
    * the conditional create on every store that has one (HDFS namenode
    * create, S3A conditional writes, [[ObjStoreSimFs]]'s hard-link
    * arbiter); the exclusivity violation can surface at create() (the
    * pre-check) or at close() (the atomic arbiter) — both map to
    * [[ConcurrentWriterException]]. Callers gate the store root with
    * [[requireExclusiveCreate]] first (the object committer and
    * [[IncrementalIvf]]'s ledger publish both do). */
  private[streaming] def createExclusive(fs: FileSystem, dst: Path, bytes: Array[Byte]): Unit =
    try {
      val out = fs.create(dst, false)
      try out.write(bytes) finally out.close()
    } catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new ConcurrentWriterException(
          s"$dst was committed by another writer (create-exclusive lost)", e)
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentWriterException(
          s"$dst was committed by another writer (create-exclusive lost)", e)
    }

  /** Loud, typed signal that the single-writer-per-root contract was
    * violated (see the class doc) — the caller's merge must be redone
    * against the advanced base, not retried blindly. */
  final class ConcurrentWriterException(msg: String, cause: Throwable = null)
    extends java.io.IOException(
      s"concurrent snapshot writer detected: $msg. The SnapshotStore " +
        "contract is ONE writer per store root; this writer's merge was " +
        "computed against a base another writer has advanced and must be " +
        "re-run.", cause)

  /** Publish a staged version dir as `v=<N>` by exclusive rename. The
    * staging dir must carry the `_WRITER.<token>` file this writer wrote;
    * the token is re-verified AFTER the rename so a filesystem that
    * resolves rename-onto-existing-dir as move-INTO (instead of failing)
    * is also caught. On any failure the winner's `dst` is left untouched
    * and this writer's staging (or mis-nested copy) is cleaned up. */
  private[streaming] def publishVersionDir(fs: FileSystem, root: Path,
      staging: Path, dst: Path, token: String): Unit = {
    def fail(why: String, cause: Throwable = null): Nothing = {
      if (fs.exists(staging)) deleteUnder(fs, root, staging)
      val misNested = new Path(dst, staging.getName)
      if (fs.exists(misNested)) deleteUnder(fs, root, misNested)
      throw new ConcurrentWriterException(s"$why (publishing $dst)", cause)
    }
    if (fs.exists(dst)) fail(s"$dst already exists")
    val renamed =
      try fs.rename(staging, dst)
      catch { case e: java.io.IOException => fail(s"rename threw", e) }
    if (!renamed) fail(s"rename $staging -> $dst failed")
    if (!fs.exists(new Path(dst, s"_WRITER.$token")))
      fail(s"$dst does not carry this writer's token after rename")
  }

  /** Deletion guard (defense against a corrupted manifest or a mangled
    * version number steering retention outside the store): refuse to
    * delete anything that does not resolve strictly under `root`. */
  private[streaming] def deleteUnder(fs: FileSystem, root: Path, victim: Path): Unit = {
    val rootPath = fs.makeQualified(root).toUri.getPath
    val victimPath = fs.makeQualified(victim).toUri.getPath
    require(victimPath.startsWith(rootPath + "/") && !victimPath.contains("/../"),
      s"refusing to delete '$victimPath' — not under store root '$rootPath'")
    fs.delete(victim, true)
  }

  // ---------------------------------------------------------------- listing

  def versionDirs(root: String): Seq[(Long, Path)] = {
    val fs = fsFor(root)
    val d = new Path(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap { st =>
        // tolerate foreign dirs (a non-numeric v= name is not ours)
        scala.util.Try(st.getPath.getName.stripPrefix("v=").toLong).toOption
          .map(_ -> st.getPath)
      }
      .sortBy(_._1)
  }

  private def isComplete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_COMMIT"))

  /** Root-level marker: this store has been written by the _COMMIT-aware
    * code at least once. Written BEFORE the first new-format parquet job,
    * so a crash inside the very first commit window cannot be mistaken
    * for a legacy store (which would wrongly surface the half-committed
    * version via the migration fallback below). */
  private def formatMarker(root: String) = new Path(root, "_FORMAT")

  def versions(root: String): Seq[Long] = {
    val obj = ObjMode.commitFiles(root)
    if (obj.nonEmpty) return obj.map(_._1)
    val fs = fsFor(root)
    val dirs = versionDirs(root)
    if (dirs.exists { case (_, p) => isComplete(fs, p) } ||
      fs.exists(formatMarker(root)))
      dirs.collect { case (v, p) if isComplete(fs, p) => v }
    else
      // migration (read path): a store with no _COMMIT anywhere AND no
      // _FORMAT marker predates the marker format entirely — accept its
      // parquet _SUCCESS dirs (batch id −1, below) rather than silently
      // resetting materialized state on upgrade. Any _COMMIT or _FORMAT
      // means new-format: a _SUCCESS-only dir is an uncommitted partial,
      // and accepting it would re-open the crash window the marker closes.
      dirs.collect {
        case (v, p) if fs.exists(new Path(p, "_SUCCESS")) => v
      }
  }

  // ---------------------------------------------------------------- manifest

  /** Nullability/metadata-insensitive schema normal form: incremental
    * writes must not mix STRUCTURALLY different schemas under one
    * multi-path read, but nullable-flag drift (a merge's join/union
    * relaxing nullability relative to the first batch's frame) is benign
    * for parquet and must not trip the guard. */
  private def normalized(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name, normalized(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = normalized(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = normalized(m.keyType),
        valueType = normalized(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def sameShape(aJson: String, bJson: String): Boolean =
    normalized(DataType.fromJson(aJson)) == normalized(DataType.fromJson(bJson))

  /** Bucket manifest of one version dir: layout params + the store schema
    * (for empty-state reads) + the bucket → hosting-version map. */
  private[streaming] final case class Manifest(
      keyCols: Seq[String], num: Int, schemaJson: String, buckets: Map[Int, Long])

  /** Line format (schema json is single-line by construction):
    * `num\nkeyCols-csv\nschema-json\nb v\nb v…` */
  private def writeManifest(fs: FileSystem, versionDir: Path, m: Manifest): Unit = {
    val body = (Seq(m.num.toString, m.keyCols.mkString(","), m.schemaJson) ++
      m.buckets.toSeq.sorted.map { case (b, v) => s"$b $v" }).mkString("\n")
    writeSmall(fs, new Path(versionDir, "_MANIFEST"),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def manifest(fs: FileSystem, versionDir: Path): Option[Manifest] = {
    val f = new Path(versionDir, "_MANIFEST")
    if (!fs.exists(f)) None
    else {
      val lines = new String(readSmall(fs, f),
        java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
      val keyCols = lines(1).split(",").toSeq.filter(_.nonEmpty)
      val buckets = lines.drop(3).filter(_.nonEmpty).map { l =>
        val Array(b, v) = l.split(" ")
        b.toInt -> v.toLong
      }.toMap
      Some(Manifest(keyCols, lines.head.toInt, lines(2), buckets))
    }
  }

  /** Manifest of `<root>/v=<version>`, if any (spec/diagnostic entry). */
  private[streaming] def manifestAt(root: String, version: Long): Option[Manifest] =
    manifest(fsFor(root), new Path(root, s"v=$version"))

  private def currentManifest(root: String): Option[(Long, Manifest)] =
    versions(root).lastOption.flatMap(v => manifestAt(root, v).map(v -> _))

  /** The physical paths holding the CURRENT snapshot's data — one `v=<N>`
    * dir for a flat store, the manifest-resolved bucket leaf dirs for a
    * bucketed one (object-layout roots resolve through their newest commit
    * object instead). Shape specs assert a merge plan scans exactly these
    * (per-batch read cost must not grow with the store's history). */
  def livePaths(root: String): Seq[String] =
    ObjMode.scanCommits(root) match {
      case ObjMode.CommitScan(Some((_, c)), _) => ObjMode.livePaths(root, c, None)
      // object layout with no PARSEABLE commit (every commit file torn —
      // only a crashed pre-scheme-matched writer could leave this): an
      // empty store, not a fall-through to the version-dir read. Both
      // facts come from ONE listing, so a commit published mid-read
      // cannot surface as a spurious empty store (r16 ADVICE).
      case ObjMode.CommitScan(None, true) => Seq.empty
      case _ =>
        versions(root).lastOption.toSeq.flatMap { v =>
          manifestAt(root, v) match {
            case Some(m) => m.buckets.toSeq.sorted.map { case (b, bv) =>
              s"$root/v=$bv/$BucketCol=$b" }
            case None => Seq(s"$root/v=$v")
          }
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
      touched: Set[Int]): Option[DataFrame] = {
    val compatible = ObjMode.newestCommit(root) match {
      case Some((_, c)) => c.man.exists(m =>
        m.num == buckets.num && m.keyCols == buckets.keyCols)
      case None => currentManifest(root).map(_._2)
        .exists(m => m.num == buckets.num && m.keyCols == buckets.keyCols)
    }
    if (compatible) readPruned(spark, root, Some(touched))
    else read(spark, root)
  }

  private def readPruned(spark: SparkSession, root: String,
      only: Option[Set[Int]]): Option[DataFrame] = {
    val scan = ObjMode.scanCommits(root) // one listing for both guards
    scan.newest.foreach { case (_, c) =>
      return Some(ObjMode.readCommit(spark, root, c, only))
    }
    // object layout, nothing parseable: empty store (see livePaths)
    if (scan.anyCommitFile) return None
    versions(root).lastOption.map { v =>
      manifestAt(root, v) match {
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
  }

  /** Batch id recorded with the current snapshot (−1 when none, and −1 for
    * a migrated pre-_COMMIT snapshot — its producing batch is unknown, so
    * replayed batches re-merge, the safe direction for idempotent merges). */
  def lastBatchId(root: String): Long = {
    val scan = ObjMode.scanCommits(root) // one listing for both guards
    scan.newest.foreach { case (_, c) => return c.batchId }
    if (scan.anyCommitFile) return -1L // all commits torn
    val fs = fsFor(root)
    versions(root).lastOption.map { v =>
      val f = new Path(root, s"v=$v/_COMMIT")
      if (!fs.exists(f)) -1L
      else new String(readSmall(fs, f)).trim.toLong
    }.getOrElse(-1L)
  }

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
  private def ensureFormat(root: String): Unit = {
    requireAtomicRename(root) // write-path gate, before any mutation
    val fs = fsFor(root)
    if (!fs.exists(formatMarker(root))) {
      val dirs = versionDirs(root)
      if (!dirs.exists { case (_, p) => isComplete(fs, p) })
        dirs.reverse.foreach { case (_, dir) =>
          if (fs.exists(new Path(dir, "_SUCCESS")) &&
            !fs.exists(new Path(dir, "_COMMIT")))
            writeSmall(fs, new Path(dir, "_COMMIT"), "-1".getBytes)
        }
      fs.mkdirs(new Path(root))
      writeSmall(fs, formatMarker(root), Array.emptyByteArray)
    }
  }

  /** Single commit point: tmp write + atomic rename, id inside the marker. */
  private[streaming] def commit(root: String, version: Long, batchId: Option[Long]): Unit = {
    // monotonic: committing at-or-below an already committed version means
    // another writer advanced the store while this merge ran — its frame
    // was computed against a stale base, so adopt-by-commit would publish
    // a lost update. Fail loud instead (single-writer contract).
    versions(root).lastOption.filter(_ >= version).foreach { newest =>
      throw new ConcurrentWriterException(
        s"version $newest is already committed at $root, refusing to " +
          s"commit v=$version behind it")
    }
    publishSmallExclusive(fsFor(root), new Path(root, s"v=$version/_COMMIT"),
      batchId.getOrElse(-1L).toString.getBytes)
    // TOCTOU closure on the monotonic guard: a racing writer can commit a
    // HIGHER version between the pre-check above and this writer's
    // exclusive publish — the marker then lands silently BEHIND the newer
    // version and this writer would believe its batch committed (a
    // contract-violating lost update; readers are unaffected, they surface
    // the highest version). Re-check after the publish and withdraw the
    // stale marker loudly. Withdrawing is data-safe: retention keeps every
    // version dir a surviving manifest references, committed or not.
    versions(root).lastOption.filter(_ > version).foreach { newest =>
      fsFor(root).delete(new Path(root, s"v=$version/_COMMIT"), false)
      throw new ConcurrentWriterException(
        s"version $newest was committed at $root while this writer " +
          s"published v=$version — the marker has been withdrawn")
    }
  }

  private val StagingPrefix = "_staging_"

  /** Diagnostic for the loss drills: artifacts a clean final write should
    * have swept — crash-leftover `_staging_` dirs (rename layout) and
    * data dirs no kept commit object references (object layout). Non-empty
    * after a clean run means retention failed to converge the store. */
  private[graft] def orphanArtifacts(root: String): Seq[String] = {
    val fs = fsFor(root)
    val d = new Path(root)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(StagingPrefix)) ++ ObjMode.orphanDataDirs(root)
  }

  /** Stage-and-publish seam shared by [[writeNext]] and
    * [[writeNextBuckets]]: runs `job` against a writer-unique staging dir
    * (invisible to readers and version listing), drops the writer token,
    * and publishes by exclusive rename. Returns the published dir. */
  private def writeVersionDir(fs: FileSystem, root: String, next: Long)(
      job: Path => Unit): Path = {
    val token = java.util.UUID.randomUUID.toString
    val staging = new Path(root, s"$StagingPrefix$next.$token")
    job(staging)
    writeSmall(fs, new Path(staging, s"_WRITER.$token"), Array.emptyByteArray)
    val dst = new Path(root, s"v=$next")
    publishVersionDir(fs, new Path(root), staging, dst, token)
    dst
  }

  /** Retention: keep the two highest COMPLETE versions (current + the
    * crash-recovery fallback) plus every version dir either of their
    * manifests still references; delete the rest (older completes and
    * partial leftovers). Within surviving BUCKETED versions, prune bucket
    * dirs neither kept manifest references — storage stays ∝ 2× live
    * state instead of accreting superseded buckets. The version just
    * written is complete, so the newest snapshot can never be deleted.
    * Every delete goes through [[deleteUnder]]: a corrupted manifest can
    * never steer retention outside the store root. */
  private def retain(root: String): Unit = {
    val fs = fsFor(root)
    val rootPath = new Path(root)
    // sweep crash-leftover staging dirs: this writer's own staging has
    // already renamed away, so anything still here is a dead writer's
    // leftover (or a live contract-violator, whose job then fails — the
    // intended outcome; see the single-writer class doc)
    fs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(StagingPrefix))
      .foreach(st => deleteUnder(fs, rootPath, st.getPath))
    val top = versions(root).takeRight(2)
    val manifests: Seq[Manifest] = top.flatMap(v => manifestAt(root, v))
    val keep = top.toSet ++ manifests.flatMap(_.buckets.values)
    versionDirs(root).filterNot { case (v, _) => keep(v) }
      .foreach { case (_, dir) => deleteUnder(fs, rootPath, dir) }
    // referenced (bucket, version) pairs across the kept manifests — built
    // from a Seq, NOT a Map keyed by bucket id: the same bucket is live in
    // TWO versions when current and fallback disagree on it
    val liveBuckets: Set[(Int, Long)] =
      manifests.flatMap(_.buckets.map { case (b, bv) => (b, bv) }).toSet
    versionDirs(root).foreach { case (v, dir) =>
      // only prune inside versions that ARE bucketed (flat dirs hold one
      // indivisible snapshot) and only when some manifest still governs them
      if (fs.exists(new Path(dir, "_MANIFEST")))
        fs.listStatus(dir)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
          .foreach { st =>
            val b = st.getPath.getName.stripPrefix(s"$BucketCol=").toInt
            if (!liveBuckets((b, v))) deleteUnder(fs, rootPath, st.getPath)
          }
    }
  }

  /** Write `df` as the next version — FULL rewrite (O(state) per call).
    * Right for O(k)-sized state (sketches, centroids, capped top-k); use
    * [[writeNextBucketed]] for corpus-proportional state. */
  def writeNext(df: DataFrame, root: String, batchId: Option[Long] = None): Unit = {
    if (committerFor(root) == "object") return ObjMode.writeNext(df, root, batchId)
    ensureFormat(root)
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    writeVersionDir(fsFor(root), root, next) { staging =>
      df.write.mode("overwrite").parquet(staging.toString)
    }
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
    * `None`) — enforced: an incremental write whose frame schema differs
    * from the manifest's recorded schema fails fast rather than mixing
    * old-schema untouched buckets with new-schema touched ones under a
    * single multi-path read.
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
    if (committerFor(root) == "object")
      return ObjMode.writeNextBuckets(df, root, batchId, buckets, touchedBuckets)
    ensureFormat(root)
    val fs = fsFor(root)
    val prev = currentManifest(root).map(_._2)
      .filter(m => m.num == buckets.num && m.keyCols == buckets.keyCols)
    val schemaJson = df.schema.json
    val touched: Option[Set[Int]] =
      if (prev.isDefined) touchedBuckets else None // no manifest: full rewrite
    // schema-change guard: an incremental write would mix old-schema
    // untouched buckets with new-schema touched ones under one multi-path
    // read. Fail LOUD rather than silently full-rewriting — the caller may
    // have built df from a pruned readTouched, so a forced full rewrite
    // here would drop the untouched buckets' data.
    touched.foreach { _ =>
      require(sameShape(prev.get.schemaJson, schemaJson),
        s"schema changed under an incremental bucketed write at $root — " +
          "a schema migration needs one full rewrite: rebuild the whole " +
          "snapshot frame and pass touchedKeys=None for this batch")
    }
    val next = versionDirs(root).lastOption.map(_._1).getOrElse(0L) + 1
    val withB = df.withColumn(BucketCol, bucketExpr(buckets.keyCols, buckets.num))
    val out = touched match {
      case Some(ts) => withB.filter(col(BucketCol).isin(ts.toSeq.map(Int.box): _*))
      case None => withB
    }
    writeVersionDir(fs, root, next) { staging =>
      out.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
      // which touched buckets actually produced rows (a touched bucket
      // whose every row vanished gets no dir — it must leave the manifest
      // too); listed and recorded while still in staging, so the published
      // dir is complete (manifest and all) the instant the rename lands
      val written =
        (if (!fs.exists(staging)) Array.empty[org.apache.hadoop.fs.FileStatus]
         else fs.listStatus(staging))
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
          .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt).toSet
      val newMap = touched match {
        case Some(ts) =>
          prev.get.buckets -- ts ++ written.map(_ -> next)
        case None => written.map(_ -> next).toMap
      }
      writeManifest(fs, staging, Manifest(buckets.keyCols, buckets.num, schemaJson, newMap))
    }
    commit(root, next, batchId)
    retain(root)
  }

  // ------------------------------------------------- object-store committer

  /** The object-store commit protocol — NO rename anywhere on the commit
    * path, because object-store rename is copy+delete and not atomic.
    *
    * Layout: data lands in writer-unique `d=<N>.<uuid>/` dirs (written
    * directly by the parquet job — never staged, never renamed; a dir no
    * commit object references is invisible garbage, so the job's internal
    * task-commit renames are correctness-irrelevant even when torn), and
    * the SINGLE commit point is a small `c=<N>` commit OBJECT at the root,
    * published by ONE exclusive publish — a conditional PUT on object
    * schemes ([[createExclusive]] — If-None-Match on S3-class stores, a
    * hard-link arbiter on [[ObjStoreSimFs]]), tmp + atomic exclusive
    * rename ([[publishSmallExclusive]]) when the committer is forced onto
    * a posix/HDFS root, where a create is not atomic-at-close (see
    * [[publishCommit]]). The commit object carries the batch id AND the
    * full data location map (the flat data dir, or the bucketed manifest
    * with every bucket's hosting dir recorded BY NAME), so readers resolve
    * a snapshot from one object read with no transitive lookups: either
    * `c=<N>` exists — completely, PUTs are all-or-nothing — and names a
    * consistent snapshot, or it does not exist and readers use `c=<N−1>`.
    * There is no window in which a crash leaves a visible-but-torn
    * version, which is exactly the guarantee the rename committer gets
    * from atomic rename and object stores cannot give it.
    *
    * Single-writer enforcement is STRONGER here than under rename: the
    * conditional PUT is the arbiter (two writers racing `c=<N>` — exactly
    * one wins, no pre-check window), the monotonic guard re-checks after
    * publish (same TOCTOU closure as [[commit]]), and a loser's orphan
    * data dir is swept by the winner's retention.
    *
    * Retention keeps the two newest commit objects plus every data dir
    * either references; bucket subdirs neither kept manifest references
    * are pruned inside surviving dirs — storage stays ∝ 2× live state,
    * as in rename mode.
    *
    * Both write paths gate on [[requireExclusiveCreate]] before any
    * mutation: the whole protocol's exactly-once claim rests on the
    * commit object's publish being a true atomic If-None-Match create,
    * and a FileSystem that emulates `overwrite=false` with a HEAD
    * pre-check must be refused (or explicitly acknowledged by conf) at
    * store open rather than silently narrowing the guarantee. */
  private[streaming] object ObjMode {

    private val CommitPrefix = "c="
    private val DataPrefix = "d="
    private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

    /** Bucketed-layout manifest with hosting data dirs recorded by NAME —
      * self-contained (no version-number indirection), so one commit
      * object read resolves the whole snapshot. */
    final case class ObjManifest(keyCols: Seq[String], num: Int,
        schemaJson: String, buckets: Map[Int, String])

    /** One commit object's content: producing batch id + data location. */
    final case class ObjCommit(batchId: Long, flatDir: Option[String],
        man: Option[ObjManifest])

    /** Artifacts a clean final write should have swept — data dirs no kept
      * (top-2 parseable) commit object references, torn commit files (name
      * parses, content does not), and stray `c=<N>.tmp` publish leftovers
      * from a posix-root mid-publish crash. See
      * [[SnapshotStore.orphanArtifacts]]. */
    def orphanDataDirs(root: String): Seq[String] = {
      val fs = fsFor(root)
      val d = new Path(root)
      if (!fs.exists(d)) return Seq.empty
      val commits = commitFiles(root)
      if (commits.isEmpty) return Seq.empty // not an object-layout root
      val parsed = commits.flatMap { case (v, p) =>
        parseCommit(fs, p).map(c => (v, p.getName, c))
      }
      val live: Set[String] = parsed.takeRight(2).flatMap { case (_, _, c) =>
        c.flatDir.toSeq ++ c.man.toSeq.flatMap(_.buckets.values)
      }.toSet
      val parseableNames = parsed.map(_._2).toSet
      val entries = fs.listStatus(d).toSeq
      entries.filter(st => st.isDirectory && st.getPath.getName.startsWith(DataPrefix))
        .map(_.getPath.getName).filterNot(live) ++
        commits.map(_._2.getName).filterNot(parseableNames) ++
        entries.filter(st => st.isFile &&
          st.getPath.getName.matches(s"$CommitPrefix\\d+\\.tmp"))
          .map(_.getPath.getName)
    }

    def commitFiles(root: String): Seq[(Long, Path)] = {
      val fs = fsFor(root)
      val d = new Path(root)
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith(CommitPrefix))
        .flatMap { st =>
          scala.util.Try(st.getPath.getName.stripPrefix(CommitPrefix).toLong)
            .toOption.map(_ -> st.getPath)
        }
        .sortBy(_._1)
    }

    /** ONE listing's consistent view of a root's commit files: the newest
      * PARSEABLE commit plus whether ANY commit file (parseable or torn)
      * exists. The read paths' all-torn guards used to derive the two
      * facts from two separate listings (`newestCommit` then
      * `commitFiles`) — a first commit published between the listings
      * made a reader report an EMPTY store even though a parseable commit
      * then existed, and every empty-or-torn read paid a second full
      * listing (r16 ADVICE). */
    final case class CommitScan(newest: Option[(Long, ObjCommit)],
        anyCommitFile: Boolean)

    def scanCommits(root: String): CommitScan = {
      val fs = fsFor(root)
      val files = commitFiles(root)
      CommitScan(
        files.reverseIterator
          .flatMap { case (v, p) => parseCommit(fs, p).map(v -> _) }
          .nextOption(),
        files.nonEmpty)
    }

    /** The newest PARSEABLE commit object. A malformed commit file — a
      * torn `c=<N>` left at its final name by a pre-scheme-matched-publish
      * writer crashing mid-write on a posix root, or a foreign file that
      * happens to match the name pattern — is SKIPPED, not thrown on:
      * readers fall back to the newest genuinely-committed snapshot
      * (exactly the crash contract: the torn object's version never
      * became visible). The skip is safe for writers too, because the
      * monotonic pre-check in [[publishCommit]] and the next-version
      * computation are NAME-based and still count the malformed file, so
      * a version number is never reused while the torn file exists;
      * [[retainObj]] sweeps it on the next successful write. */
    def newestCommit(root: String): Option[(Long, ObjCommit)] = {
      val fs = fsFor(root)
      commitFiles(root).reverseIterator
        .flatMap { case (v, p) => parseCommit(fs, p).map(v -> _) }
        .nextOption()
    }

    /** [[parse]] that tolerates torn/foreign commit files (None). */
    private def parseCommit(fs: FileSystem, p: Path): Option[ObjCommit] =
      scala.util.Try(parse(readSmall(fs, p))).toOption

    /** Line format: batchId, layout tag, then either the flat data dir or
      * `num / keyCols-csv / schema-json / "b dir"…` (schema json is
      * single-line by construction, like the rename-mode `_MANIFEST`). */
    private def serialize(c: ObjCommit): Array[Byte] = {
      val body = (c.flatDir, c.man) match {
        case (Some(dir), None) =>
          Seq(c.batchId.toString, "flat", dir).mkString("\n")
        case (None, Some(m)) =>
          (Seq(c.batchId.toString, "bucketed", m.num.toString,
            m.keyCols.mkString(","), m.schemaJson) ++
            m.buckets.toSeq.sortBy(_._1).map { case (b, d) => s"$b $d" })
            .mkString("\n")
        case _ => throw new IllegalArgumentException(
          "commit object must carry exactly one of flatDir/manifest")
      }
      body.getBytes(Utf8)
    }

    private def parse(bytes: Array[Byte]): ObjCommit = {
      val lines = new String(bytes, Utf8).split("\n", -1).toSeq
      val bid = lines.head.trim.toLong
      lines(1) match {
        case "flat" => ObjCommit(bid, Some(lines(2)), None)
        case "bucketed" =>
          val keyCols = lines(3).split(",").toSeq.filter(_.nonEmpty)
          val buckets = lines.drop(5).filter(_.nonEmpty).map { l =>
            val i = l.indexOf(' ')
            l.take(i).toInt -> l.drop(i + 1)
          }.toMap
          ObjCommit(bid, None,
            Some(ObjManifest(keyCols, lines(2).toInt, lines(4), buckets)))
        case other => throw new java.io.IOException(
          s"unknown commit-object layout tag '$other'")
      }
    }

    def livePaths(root: String, c: ObjCommit, only: Option[Set[Int]]): Seq[String] =
      c.man match {
        case Some(m) =>
          val live = only match {
            case Some(ts) => m.buckets.filter { case (b, _) => ts(b) }
            case None => m.buckets
          }
          live.toSeq.sortBy(_._1).map { case (b, d) => s"$root/$d/$BucketCol=$b" }
        case None => c.flatDir.toSeq.map(d => s"$root/$d")
      }

    def readCommit(spark: SparkSession, root: String, c: ObjCommit,
        only: Option[Set[Int]]): DataFrame =
      c.man match {
        case Some(m) =>
          val paths = livePaths(root, c, only)
          if (paths.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
          else spark.read.parquet(paths: _*)
        case None => spark.read.parquet(s"$root/${c.flatDir.get}")
      }

    /** The commit point: monotonic pre-check, ONE exclusive publish of the
      * commit object, TOCTOU re-check (mirror of [[commit]]).
      *
      * The publish primitive is SCHEME-MATCHED to whichever operation is
      * atomic on the root's filesystem — the same selection
      * [[IncrementalIvf]]'s fold-ledger publish makes, and for the same
      * reason: on object schemes [[createExclusive]] is one conditional
      * PUT (all-or-nothing — a killed writer leaves NOTHING at the name,
      * If-None-Match is the arbiter), but the object committer can also
      * be FORCED onto a posix root ([[committerFor]]'s conf override),
      * where `create(dst, overwrite=false)` is NOT atomic-at-close — a
      * SIGKILL between create and close would strand a torn `c=<N>` at
      * its final name. There the torn-proof form is
      * [[publishSmallExclusive]] (tmp + atomic exclusive rename; a
      * mid-write kill leaves only a stray `.tmp`, swept by retention).
      * Readers additionally skip malformed commit files
      * ([[newestCommit]]) so even a legacy torn object cannot strand the
      * store unreadable. */
    private[streaming] def publishCommit(fs: FileSystem, root: String, version: Long,
        c: ObjCommit): Unit = {
      commitFiles(root).lastOption.map(_._1).filter(_ >= version).foreach { n =>
        throw new ConcurrentWriterException(
          s"version $n is already committed at $root, refusing to " +
            s"commit v=$version behind it")
      }
      val dst = new Path(root, s"$CommitPrefix$version")
      if (isObjectScheme(root)) createExclusive(fs, dst, serialize(c))
      else publishSmallExclusive(fs, dst, serialize(c))
      commitFiles(root).lastOption.map(_._1).filter(_ > version).foreach { n =>
        fs.delete(dst, false)
        throw new ConcurrentWriterException(
          s"version $n was committed at $root while this writer published " +
            s"v=$version — the commit object has been withdrawn")
      }
    }

    private def newDataDir(next: Long): String =
      s"$DataPrefix$next.${java.util.UUID.randomUUID}"

    def writeNext(df: DataFrame, root: String, batchId: Option[Long]): Unit = {
      requireExclusiveCreate(root) // capability gate, before any mutation
      val fs = fsFor(root)
      fs.mkdirs(new Path(root))
      val next = commitFiles(root).lastOption.map(_._1).getOrElse(0L) + 1
      val dataDir = newDataDir(next)
      df.write.mode("overwrite").parquet(s"$root/$dataDir")
      publishCommit(fs, root, next,
        ObjCommit(batchId.getOrElse(-1L), Some(dataDir), None))
      retainObj(root)
    }

    def writeNextBuckets(df: DataFrame, root: String, batchId: Option[Long],
        buckets: Buckets, touchedBuckets: Option[Set[Int]]): Unit = {
      requireExclusiveCreate(root) // capability gate, before any mutation
      val fs = fsFor(root)
      fs.mkdirs(new Path(root))
      val prev = newestCommit(root).flatMap(_._2.man)
        .filter(m => m.num == buckets.num && m.keyCols == buckets.keyCols)
      val schemaJson = df.schema.json
      val touched: Option[Set[Int]] =
        if (prev.isDefined) touchedBuckets else None // no manifest: full rewrite
      touched.foreach { _ => // same loud guard as the rename committer
        require(sameShape(prev.get.schemaJson, schemaJson),
          s"schema changed under an incremental bucketed write at $root — " +
            "a schema migration needs one full rewrite: rebuild the whole " +
            "snapshot frame and pass touchedKeys=None for this batch")
      }
      val next = commitFiles(root).lastOption.map(_._1).getOrElse(0L) + 1
      val withB = df.withColumn(BucketCol, bucketExpr(buckets.keyCols, buckets.num))
      val out = touched match {
        case Some(ts) => withB.filter(col(BucketCol).isin(ts.toSeq.map(Int.box): _*))
        case None => withB
      }
      val dataDir = newDataDir(next)
      val dataPath = new Path(root, dataDir)
      out.write.mode("overwrite").partitionBy(BucketCol).parquet(dataPath.toString)
      val written =
        (if (!fs.exists(dataPath)) Array.empty[org.apache.hadoop.fs.FileStatus]
         else fs.listStatus(dataPath))
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
          .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt).toSet
      val newMap = touched match {
        case Some(ts) => prev.get.buckets -- ts ++ written.map(_ -> dataDir)
        case None => written.map(_ -> dataDir).toMap
      }
      publishCommit(fs, root, next, ObjCommit(batchId.getOrElse(-1L), None,
        Some(ObjManifest(buckets.keyCols, buckets.num, schemaJson, newMap))))
      retainObj(root)
    }

    /** Retention: keep the two newest PARSEABLE commit objects + every
      * data dir either references; everything else — older commit objects,
      * malformed/torn commit files (a pre-scheme-matched-publish crash's
      * leftover: the current publish cannot tear — conditional PUT on
      * object schemes, tmp+exclusive-rename on posix), stray `c=<N>.tmp`
      * publish tmps, superseded data dirs, dead writers' orphan dirs (a
      * crashed or racing writer's parquet output that no commit ever
      * adopted) — is deleted, bucket subdirs pruned inside surviving dirs.
      * All dir deletes go through [[deleteUnder]]. Called only right after
      * a successful [[publishCommit]], so at least one parseable commit
      * always survives. */
    private def retainObj(root: String): Unit = {
      val fs = fsFor(root)
      val rootPath = new Path(root)
      val commits = commitFiles(root)
      val kept = commits.flatMap { case (v, p) =>
        parseCommit(fs, p).map(c => (v, p, c))
      }.takeRight(2).map { case (v, _, c) => v -> c }
      val keptVersions = kept.map(_._1).toSet
      commits.filterNot { case (v, _) => keptVersions(v) }
        .foreach { case (_, p) => fs.delete(p, false) }
      fs.listStatus(rootPath).toSeq
        .filter(st => st.isFile &&
          st.getPath.getName.matches(s"$CommitPrefix\\d+\\.tmp"))
        .foreach(st => fs.delete(st.getPath, false))
      val liveDirs: Set[String] = kept.flatMap { case (_, c) =>
        c.flatDir.toSeq ++ c.man.toSeq.flatMap(_.buckets.values)
      }.toSet
      fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(DataPrefix))
        .filterNot(st => liveDirs(st.getPath.getName))
        .foreach(st => deleteUnder(fs, rootPath, st.getPath))
      // referenced (dir, bucket) pairs — built via toSeq, NOT by mapping
      // the Map (inverting a Map[Int, String] keys by dir name and
      // collapses every bucket of one dir into a single entry)
      val liveBuckets: Set[(String, Int)] = kept.flatMap { case (_, c) =>
        c.man.toSeq.flatMap(_.buckets.toSeq.map { case (b, d) => (d, b) })
      }.toSet
      liveBuckets.map(_._1).foreach { d =>
        val dp = new Path(root, d)
        if (fs.exists(dp))
          fs.listStatus(dp)
            .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BucketCol="))
            .foreach { st =>
              val b = st.getPath.getName.stripPrefix(s"$BucketCol=").toInt
              if (!liveBuckets((d, b))) deleteUnder(fs, rootPath, st.getPath)
            }
      }
    }
  }
}
