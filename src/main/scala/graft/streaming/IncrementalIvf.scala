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
  *    directory complete and skips — the write-once twin of
  *    [[SnapshotStore]]'s batch-id contract, without rewriting the
  *    corpus-sized table per batch).
  *
  * Delta dirs are COMPACTED in two tiers so the directory count stays
  * bounded WITHOUT refolding all history every cycle: past
  * `spark.graft.ivf.assign.maxDeltaDirs` (default 16) raw batch dirs,
  * the oldest half folds into one tier-1 dir; past maxDirs/4 tier-1
  * dirs, those merge into one — amortized per-batch fold IO
  * ∝ arrived/(maxDirs²/8), never a per-batch corpus rewrite (see
  * maybeCompact).
  *
  * == Commit protocol (object-store-safe: NO rename on the object-store
  * commit path) ==
  *
  * The live directory set is defined entirely by the LEDGER
  * (`_folded_through.<seq>`, readers take the max seq):
  *
  *   live = {fold dirs the ledger lists, BY NAME}
  *        ∪ {`batch=<id>` dirs with id > foldedThrough AND `_SUCCESS`}
  *
  * A fold writes its combined rows DIRECTLY to a final, never-colliding
  * `fold=<seq>.<uuid>` dir (no staging, no rename — a dir the ledger does
  * not list is invisible garbage, exactly the stance of
  * [[SnapshotStore.ObjMode]]'s `d=<N>.<uuid>` data dirs), then publishes
  * the next ledger version with ONE exclusive publish — a conditional
  * PUT on object stores ([[SnapshotStore.createExclusive]], If-None-Match
  * on S3-class stores, [[ObjStoreSimFs]]'s hard-link arbiter; a PUT is
  * all-or-nothing, so no rename is needed OR used there), tmp + atomic
  * exclusive rename on posix/HDFS where create is not atomic-at-close —
  * and only THEN garbage-collects the replaced dirs and superseded ledger
  * versions. A crash before the publish leaves the originals live and a
  * garbage fold dir to sweep; a crash after it leaves dead originals the
  * next merge sweeps — in both halves readers resolve a consistent,
  * never-double-counted index with no recovery step. Reads RACING a live
  * maintainer are made consistent by [[livePaths]]' seq-stable read (the
  * ledger seq is re-checked after the listing/probes and the read retries
  * if a publish interleaved — see its doc for the window it closes). The `_SUCCESS` clause makes a torn raw delta (writer crashed
  * mid-parquet-job) invisible to readers too — its replay repairs the dir
  * with `mode(overwrite)` before the cell counts ever include it.
  *
  * Because the commit point is an exclusive create, the store carries the
  * same capability requirement as the object committer: `merge` gates on
  * [[SnapshotStore.requireExclusiveCreate]] (classic S3A's HEAD-then-PUT
  * `overwrite=false` is refused unless explicitly acknowledged). The
  * watermark keeps replay exact: a replayed batch at or below
  * foldedThrough must NOT rewrite its (now folded-away) delta dir.
  *
  * == Legacy layout migration ==
  *
  * Stores written before this protocol staged folds at `_fold_v<target>`
  * and RENAMED them onto `batch=<target>` after a ledger whose fold list
  * was bare ids. Those ledgers parse transparently (a bare id token means
  * dir `batch=<id>`), so a legacy store's live set resolves through the
  * same ledger-driven read with zero rewrite; an interrupted legacy fold
  * (staging dir present) is completed or discarded by
  * `recoverLegacyFold` — the one surviving rename, safe by construction
  * because only rename-atomic filesystems can hold legacy layouts (the
  * old code refused object schemes outright).
  *
  * All metadata IO (existence probes, ledger, sweep deletes) goes through
  * `org.apache.hadoop.fs.FileSystem` resolved from the state root's
  * scheme, so the index works unchanged on `file://`, HDFS, and
  * conditional-create object stores.
  *
  * `balanceView` reproduces the s20 cell-balance audit (the re-train
  * signal) over everything arrived so far; `assignments` reads the live
  * set back as the full index — both parity-specced against the batch
  * forms on the same rows (IncrementalIvfSpec). When the audit crosses
  * its threshold, the operator re-trains offline, swaps the frozen
  * centroids, and resets state — each generation is one exact batch
  * build.
  */
object IncrementalIvf {

  /** Conf key bounding the number of live raw `assign/batch=<id>` delta
    * dirs; crossing it folds the older half into one dir. */
  val MaxDeltaDirsKey = "spark.graft.ivf.assign.maxDeltaDirs"

  /** Conf key (default false) making [[assignments]] EAGER: the returned
    * frame is materialized (localCheckpoint) before it is handed out, so
    * holding it across later fold cycles cannot race the post-publish
    * sweep of a superseded dir — the lazy-read caveat
    * [[IvfLazyReadSpec]] pins. The trade: the snapshot occupies block
    * storage and, on a real cluster, dies with its executors (recompute
    * is impossible once the source dirs are swept) — right for a consumer
    * that reads, computes, and releases; wrong for a frame cached across
    * the application's lifetime. */
  val EagerAssignmentsKey = "spark.graft.ivf.eagerAssignments"

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

  private val FoldPrefix = "fold="

  private def rawId(name: String): Option[Long] =
    if (name.startsWith("batch="))
      scala.util.Try(name.stripPrefix("batch=").toLong).toOption
    else None

  private def dirNames(fs: FileSystem, stateRoot: String): Seq[String] = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  private val LedgerName = "_folded_through"

  /** Durable fold ledger: `through` = highest RAW batch id whose delta
    * rows live inside a folded dir (the replay guard — a batch at or
    * below it must not rewrite its delta), `folds` = the NAMES of the
    * live fold-produced dirs, making the ledger the single source of the
    * live directory set. File format: line 1 = through, line 2 =
    * space-separated fold dir names; a bare-number token `N` is the
    * legacy spelling of `batch=N` (the pre-object-store fold target
    * naming), so legacy ledgers parse with no migration step. */
  private[streaming] final case class FoldState(through: Long, folds: Seq[String])

  /** Ledger files are VERSIONED (`_folded_through.<seq>`, readers take
    * the max seq) so a publish NEVER deletes the live ledger before its
    * replacement is in place: each new ledger version is ONE exclusive
    * create of a FRESH name — nothing deleted first, nothing renamed —
    * and old versions are garbage-collected only after the new one is
    * durably visible. A bare legacy `_folded_through` parses as seq 0. */
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

  private def parseFoldToken(tok: String): String =
    if (tok.contains("=")) tok else s"batch=$tok" // bare id = legacy naming

  private[streaming] def foldState(fs: FileSystem, stateRoot: String): FoldState = {
    ledgerFiles(fs, stateRoot).lastOption match {
      case None => FoldState(-1L, Seq.empty)
      case Some((_, p)) =>
        val lines = readSmall(fs, p).split("\n", -1).toSeq
        FoldState(lines.head.trim.toLong,
          lines.lift(1).map(_.trim).filter(_.nonEmpty)
            .map(_.split(" ").toSeq.map(parseFoldToken)).getOrElse(Seq.empty).sorted)
    }
  }

  private def foldedThrough(fs: FileSystem, stateRoot: String): Long =
    foldState(fs, stateRoot).through

  /** Ledger publish: ONE exclusive publish of the next versioned name
    * (the commit point — always a fresh path, so no absent-ledger window
    * and no delete-before-replace). The primitive is scheme-matched to
    * whichever operation is atomic there: on object stores a conditional
    * PUT ([[SnapshotStore.createExclusive]] — a PUT is all-or-nothing, a
    * killed writer leaves NOTHING at the name, and If-None-Match is the
    * arbiter), on posix/HDFS tmp + atomic exclusive rename
    * ([[SnapshotStore.publishSmallExclusive]] — a posix create is NOT
    * atomic-at-close, so a kill mid-write would otherwise leave a torn
    * ledger at the final name; the stray `.tmp` is swept). A lost
    * publish means a second writer raced this seq: the single-writer
    * contract was violated, and the loser fails loudly with
    * [[SnapshotStore.ConcurrentWriterException]] instead of silently
    * adopting a fold set it did not compute. Superseded versions are
    * swept AFTER the publish (sweepGarbage), so foldedThrough never
    * regresses — readers take the max seq. */
  private def publishState(fs: FileSystem, stateRoot: String, st: FoldState,
      seq: Long): Unit = {
    val dst = new Path(assignDir(stateRoot), s"$LedgerName.$seq")
    val bytes = s"${st.through}\n${st.folds.sorted.mkString(" ")}".getBytes
    if (SnapshotStore.isObjectScheme(stateRoot))
      SnapshotStore.createExclusive(fs, dst, bytes)
    else
      SnapshotStore.publishSmallExclusive(fs, dst, bytes)
  }

  private def nextLedgerSeq(fs: FileSystem, stateRoot: String): Long =
    ledgerFiles(fs, stateRoot).lastOption.map(_._1).getOrElse(0L) + 1

  /** Fold the given live dirs into one `fold=<seq>.<uuid>` dir written
    * directly at its final name, publish the ledger that swaps the fold
    * set, then sweep the replaced dirs. Crash-safe with no recovery step:
    * before the publish the new dir is unlisted garbage and the originals
    * stay live; after it the originals are unlisted garbage — either way
    * the ledger names exactly one consistent set. */
  private def foldOnce(spark: SparkSession, stateRoot: String, fs: FileSystem,
      prev: FoldState, foldSet: Seq[String], newThrough: Long): Unit = {
    val seq = nextLedgerSeq(fs, stateRoot)
    val newDir = s"$FoldPrefix$seq.${java.util.UUID.randomUUID}"
    spark.read.parquet(foldSet.map(n => s"$stateRoot/assign/$n"): _*)
      .select(col("cid"), col("cent_id"))
      .write.mode("overwrite").parquet(s"$stateRoot/assign/$newDir")
    publishFold(fs, stateRoot,
      FoldState(math.max(prev.through, newThrough),
        (prev.folds.filterNot(foldSet.contains) :+ newDir).sorted), seq, newDir)
    sweepGarbage(fs, stateRoot)
  }

  /** The guarded commit step of a fold: re-verify the fold dir this writer
    * just wrote still exists, then publish the ledger version that makes
    * it live. The existence re-check closes (to a hairline) the one
    * interleaving a single-writer-contract violation could slip through
    * SILENTLY: a second maintainer's merge-start [[sweepGarbage]] deletes
    * any UNLISTED fold dir, so it can remove this writer's
    * written-but-unpublished fold — and this writer's exclusive ledger
    * publish would still WIN (no seq conflict: the sweeper published
    * nothing), committing a ledger that lists a missing dir while the
    * replaced originals get swept. That is silent data loss where the
    * contract promises a loud failure; checking immediately before the
    * publish turns the interleaving into
    * [[SnapshotStore.ConcurrentWriterException]] with the previous ledger
    * state untouched (a racer must now land its sweep inside the
    * check→publish gap — the IvfLedgerRaceSpec pins both shapes). */
  private[streaming] def publishFold(fs: FileSystem, stateRoot: String,
      st: FoldState, seq: Long, newDir: String): Unit = {
    if (!fs.exists(new Path(assignDir(stateRoot), newDir)))
      throw new SnapshotStore.ConcurrentWriterException(
        s"fold dir $newDir vanished before its ledger publish — a concurrent " +
          "maintainer's sweep deleted it (two writers on one IVF state root)")
    publishState(fs, stateRoot, st, seq)
  }

  /** Maintainer-side garbage sweep, idempotent and safe at any time AFTER
    * a ledger publish: deletes fold dirs the ledger does not list (a
    * pre-publish crash's orphan, or a post-publish original), raw batch
    * dirs at or below the watermark that are not themselves listed (the
    * originals of legacy raw folds keep their `batch=<id>` names in the
    * ledger), superseded ledger versions, and stray legacy ledger tmps.
    * Never touches `_fold_v` staging (that is [[recoverLegacyFold]]'s
    * job — an unpublished staging dir may be a live legacy maintainer's
    * in-flight fold). */
  private[streaming] def sweepGarbage(fs: FileSystem, stateRoot: String): Unit = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) return
    val ledgers = ledgerFiles(fs, stateRoot)
    val st = foldState(fs, stateRoot)
    val topSeq = ledgers.lastOption.map(_._1).getOrElse(-1L)
    fs.listStatus(d).foreach { s =>
      val n = s.getPath.getName
      val dead =
        if (s.isDirectory)
          (n.startsWith(FoldPrefix) && !st.folds.contains(n)) ||
            rawId(n).exists(id => id <= st.through && !st.folds.contains(n))
        else
          ledgerSeq(n).exists(_ < topSeq) ||
            (n.startsWith(LedgerName + ".") && n.endsWith(".tmp"))
      if (dead) fs.delete(s.getPath, true)
    }
  }

  // ------------------------------------------------- legacy fold migration

  private def foldStaging(stateRoot: String, target: Long) =
    new Path(assignDir(stateRoot), s"_fold_v$target")

  private def foldsFile(staging: Path) = new Path(staging, "_FOLDS")

  /** Complete the legacy finalize: delete exactly the recorded original
    * dirs, then rename the staging dir to `batch=<target>`. Legacy stores
    * only exist on rename-atomic filesystems (the old code refused object
    * schemes before any write), so the rename here is safe; new-layout
    * folds never create staging dirs, so this path is migration-only. */
  private def finalizeLegacyFold(fs: FileSystem, stateRoot: String, target: Long,
      foldSet: Seq[Long]): Unit = {
    foldSet.foreach { id =>
      fs.delete(new Path(assignDir(stateRoot), s"batch=$id"), true)
    }
    val staging = foldStaging(stateRoot, target)
    if (fs.exists(staging) &&
      !fs.rename(staging, new Path(assignDir(stateRoot), s"batch=$target")))
      throw new java.io.IOException(s"fold rename failed for $staging")
  }

  /** Complete or discard an interrupted LEGACY fold (`_fold_v<target>`
    * staging). Deterministic from on-disk state alone: a staging dir
    * whose target the ledger lists as a live fold dir (and which carries
    * `_SUCCESS` + `_FOLDS`) was mid-publish under the old protocol —
    * finish it by replaying the recorded deletes + rename; anything else
    * is pre-publish garbage — the originals are intact, drop it.
    *
    * `gcIncomplete` distinguishes the two callers: the MAINTAINER (merge)
    * passes true and also drops pre-publish garbage; READ-ONLY consumers
    * (assignments/balanceView, possibly in a different process while a
    * maintainer is live) pass false — they still COMPLETE a published
    * legacy fold (finalize is idempotent, and without it the folded rows
    * would be invisible: originals deleted, staging unlisted), but they
    * must never delete a staging dir a concurrent legacy maintainer may
    * be mid-writing. */
  private def recoverLegacyFold(fs: FileSystem, stateRoot: String,
      gcIncomplete: Boolean): Unit = {
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) return
    val stale = fs.listStatus(d)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_fold_v"))
    if (stale.isEmpty) return
    val st = foldState(fs, stateRoot)
    stale.foreach { s =>
      val target = s.getPath.getName.stripPrefix("_fold_v").toLong
      val complete = fs.exists(new Path(s.getPath, "_SUCCESS")) &&
        fs.exists(foldsFile(s.getPath))
      if (complete && st.folds.contains(s"batch=$target")) {
        val foldSet = readSmall(fs, foldsFile(s.getPath)).trim
          .split(" ").toSeq.filter(_.nonEmpty).map(_.toLong)
        finalizeLegacyFold(fs, stateRoot, target, foldSet)
      } else if (gcIncomplete)
        fs.delete(s.getPath, true)
    }
  }

  // --------------------------------------------------------- live-set read

  /** The current live directory set: ledger-listed fold dirs (taken from
    * the ledger BY NAME — they exist before their ledger version is ever
    * visible) plus raw deltas above the watermark whose parquet job
    * committed (`_SUCCESS`) — a torn raw dir is invisible until its
    * replay repairs it, and an unlisted fold dir is garbage by definition.
    *
    * == Concurrent-read consistency (seq-stable read) ==
    *
    * A read-only consumer may race a live maintainer (explicitly
    * supported), and this resolution spans several metadata calls: a fold
    * publish + sweep landing BETWEEN them could hand back a shrunken set
    * — e.g. ledger read first, then a fold publishes and sweeps its raw
    * dirs, then the listing/`_SUCCESS` probes run: the folded raws are
    * gone and the stale fold list does not name their fold dir. The
    * guard: the ledger seq is read before AND re-read after the
    * listing+probes — an UNCHANGED seq proves no publish interleaved, and
    * without a publish no sweep can have touched anything this read
    * references (a merge-start sweep only deletes dirs already dead under
    * the seq both reads saw: raws at/below the watermark and unlisted
    * fold dirs, none of which this read returns). A changed seq (or a
    * dir swept mid-read) retries the whole read; folds are rare (once
    * per ~maxDirs/2 batches) so a second pass is already unlikely, and a
    * pathological always-advancing ledger fails loudly rather than
    * looping.
    *
    * Remaining caveat (inherent to snapshot-less directory reads): the
    * returned paths are consumed LAZILY by Spark — a frame held
    * unmaterialized across later fold cycles can still race the sweep of
    * a superseded dir. Materialize promptly. */
  private[streaming] def livePaths(fs: FileSystem, stateRoot: String): Seq[String] = {
    var attempt = 0
    var lastRace: Throwable = null
    while (attempt < 8) {
      try {
        val seq0 = ledgerFiles(fs, stateRoot).lastOption.map(_._1).getOrElse(-1L)
        val st = foldState(fs, stateRoot)
        val names = dirNames(fs, stateRoot)
        val raws = names
          .filter(n => rawId(n).exists(_ > st.through))
          .filter(n => fs.exists(new Path(assignDir(stateRoot), s"$n/_SUCCESS")))
        val seq1 = ledgerFiles(fs, stateRoot).lastOption.map(_._1).getOrElse(-1L)
        if (seq1 == seq0)
          return (st.folds ++ raws).distinct.sorted.map(n => s"$stateRoot/assign/$n")
      } catch {
        // a superseded ledger version swept between our listing and read:
        // a publish interleaved — same signal as an advanced seq, retry.
        // Hadoop filesystems surface this as a bare FileNotFoundException,
        // OTHER IOException subclasses ("<p> does not exist"), or an FNFE
        // wrapped in a cause — match the whole chain, mirroring the
        // IvfLedgerRaceSpec reader's own matcher (r16 ADVICE); anything
        // that is NOT a missing-path signal is a real IO failure and
        // rethrows rather than burning retries against it
        case e: java.io.IOException if isMissingPathSignal(e) => lastRace = e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"IVF fold ledger at $stateRoot advanced concurrently through $attempt " +
        "consecutive live-set reads — cannot resolve a consistent index",
      lastRace)
  }

  /** True when `e`'s cause chain carries a missing-path signal — a
    * [[java.io.FileNotFoundException]] at any depth, or an IOException
    * whose message says the path does not exist (the two shapes a
    * sweep-vs-list race takes across Hadoop FileSystem implementations). */
  private[streaming] def isMissingPathSignal(e: Throwable): Boolean = {
    @annotation.tailrec
    def loop(t: Throwable, depth: Int): Boolean =
      if (t == null || depth > 16) false
      else if (t.isInstanceOf[java.io.FileNotFoundException]) true
      else if (Option(t.getMessage).exists(m =>
        m.contains("does not exist") || m.contains("FileNotFound"))) true
      else loop(t.getCause, depth + 1)
    loop(e, 0)
  }

  /** Two-tier compaction, so per-batch fold IO stays amortized-bounded
    * instead of refolding all history every cycle:
    *
    *  - tier 0 (raw deltas): when more than `maxDirs` live raw batch dirs
    *    exist, the oldest half fold into ONE tier-1 dir — each raw row
    *    is folded here exactly once. Only the contiguous `_SUCCESS`
    *    prefix is foldable: folding past a torn raw dir would put it
    *    under the watermark and lose its replay;
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
    * maxDirs=2 until the IvfFoldLossDrill caught it. */
  private def maybeCompact(spark: SparkSession, stateRoot: String,
      fs: FileSystem): Unit = {
    val maxDirs = spark.conf.getOption(MaxDeltaDirsKey).map(_.toInt).getOrElse(16)
    val maxFolds = math.max(2, maxDirs / 4)
    def liveState(): (FoldState, Seq[(Long, String)]) = {
      val st = foldState(fs, stateRoot)
      val names = dirNames(fs, stateRoot)
      val raws = names.flatMap(n => rawId(n).map(_ -> n))
        .filter { case (id, _) => id > st.through }
        .sortBy(_._1)
      (st.copy(folds = st.folds.filter(names.contains)), raws)
    }
    val (st, raws) = liveState()
    if (raws.size > maxDirs) {
      // fold only the contiguous committed prefix (see scaladoc)
      val committedPrefix = raws.takeWhile { case (_, n) =>
        fs.exists(new Path(assignDir(stateRoot), s"$n/_SUCCESS"))
      }
      val foldSet = committedPrefix.take(
        math.max(0, raws.size - math.max(2, maxDirs / 2)))
      if (foldSet.size >= 2)
        foldOnce(spark, stateRoot, fs, st, foldSet.map(_._2),
          newThrough = foldSet.map(_._1).max)
    }
    // re-read: the raw fold above may have changed the ledger/dir set
    val (st2, _) = liveState()
    if (st2.folds.size > maxFolds)
      foldOnce(spark, stateRoot, fs, st2, st2.folds, newThrough = st2.through)
  }

  // ---------------------------------------------------------------- merge

  /** Apply one micro-batch: write the assignment delta (idempotent by
    * batch directory) and merge the per-cell counts (additive). Write
    * completion is judged by the committer's `_SUCCESS` marker, not bare
    * directory existence — a crash mid-write leaves a partial
    * `batch=<id>` dir (invisible to readers via the live-set rule), and
    * the replay must repair it (mode("overwrite") clears the torn
    * files), or the assignment index would silently miss the batch the
    * cell counts include. A batch at or below the fold watermark is
    * already inside a folded dir — rewriting its delta would double its
    * rows, so the watermark check comes first. */
  def merge(batch: DataFrame, cents: DataFrame, batchId: Long,
      stateRoot: String): Unit = {
    val spark = batch.sparkSession
    SnapshotStore.requireExclusiveCreate(stateRoot) // fail BEFORE the delta write
    val fs = fsFor(stateRoot)
    recoverLegacyFold(fs, stateRoot, gcIncomplete = true)
    sweepGarbage(fs, stateRoot)
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

  /** Diagnostic for the loss drills: artifacts a clean final merge should
    * have swept — legacy `_fold_v` staging, fold dirs the ledger does not
    * list, raw dirs at or below the watermark, superseded ledger
    * versions. Non-empty after a clean run means the sweep failed to
    * converge the store. */
  private[graft] def orphanArtifacts(stateRoot: String): Seq[String] = {
    val fs = fsFor(stateRoot)
    val d = assignDir(stateRoot)
    if (!fs.exists(d)) return Seq.empty
    val st = foldState(fs, stateRoot)
    val topSeq = ledgerFiles(fs, stateRoot).lastOption.map(_._1).getOrElse(-1L)
    fs.listStatus(d).toSeq.flatMap { s =>
      val n = s.getPath.getName
      val orphan =
        if (s.isDirectory)
          n.startsWith("_fold_v") ||
            (n.startsWith(FoldPrefix) && !st.folds.contains(n)) ||
            rawId(n).exists(id => id <= st.through && !st.folds.contains(n))
        else ledgerSeq(n).exists(_ < topSeq)
      if (orphan) Some(n) else None
    }
  }

  /** The full maintained assignment index: union of the live fold and
    * delta dirs — empty (same schema) before the first batch lands, like
    * [[balanceView]]. Resolves the live set via [[livePaths]]' seq-stable
    * read (consistent under a racing maintainer, no recovery step on the
    * current layout); the one legacy exception is a
    * published-but-unfinalized `_fold_v` staging from the pre-object-store
    * protocol, completed here so a migrated store never reads shrunken.
    *
    * LAZY-READ CAVEAT (pinned by IvfLazyReadSpec): the returned frame
    * references the live dirs by path, and Spark consumes them lazily — a
    * frame held UNMATERIALIZED across enough later fold cycles races the
    * post-publish sweep of a superseded dir and fails loudly (missing-
    * path error) at materialize time; it never returns partial data.
    * Materialize promptly, or set [[EagerAssignmentsKey]]=true to have
    * this method hand out an already-materialized snapshot. */
  def assignments(spark: SparkSession, stateRoot: String): DataFrame = {
    val fs = fsFor(stateRoot)
    recoverLegacyFold(fs, stateRoot, gcIncomplete = false)
    val paths = livePaths(fs, stateRoot)
    val df =
      if (paths.isEmpty)
        spark.emptyDataFrame
          .select(lit(0L).as("cid"), lit(0L).as("cent_id")).limit(0)
      else spark.read.parquet(paths: _*)
    if (spark.conf.getOption(EagerAssignmentsKey).exists(_.trim.equalsIgnoreCase("true")))
      df.localCheckpoint(true) // materialized now: immune to later sweeps
    else df
  }

  /** The live s20 cell-balance report over everything arrived so far —
    * cell-count-sized compute off the k-row state, never a corpus scan.
    * (The cells snapshot itself is fold-independent, but a fresh
    * read-only consumer may be the first process up after a legacy-store
    * crash, so it completes a published legacy fold too — keeps the
    * store's on-disk state converging regardless of which entry point
    * runs first.) */
  def balanceView(spark: SparkSession, stateRoot: String): DataFrame = {
    recoverLegacyFold(fsFor(stateRoot), stateRoot, gcIncomplete = false)
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
