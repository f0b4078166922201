package graft

/** The writer PROCESS the driver-loss drill SIGKILLs: a minimal
  * foreachBatch-shaped loop that replays a pre-written op log through ONE
  * maintainer's `merge` — parameterized over the maintainers whose commit
  * protocols have the riskiest crash windows:
  *
  *  - `agg`     — [[graft.streaming.IncrementalAgg]]: NON-idempotent
  *                delta-applying merge (the original drill target);
  *  - `gapfill` — [[graft.streaming.IncrementalGapFill]]: TWO-store
  *                commit (obs then view) — a kill between the two writes
  *                must be healed by the view-gated replay;
  *  - `scd`     — [[graft.streaming.ScdHistory]]: close-then-append — a
  *                replayed batch must not re-close or duplicate versions;
  *  - `shard`   — [[graft.streaming.IncrementalShardManifest]]: the
  *                bucketed read-pruned store's manifest commit path
  *                (readTouched + writeNextBuckets);
  *  - `ivf`     — [[graft.streaming.IncrementalIvf]]: delta dir + cells
  *                snapshot + fold ledger, with `maxDeltaDirs=2` so the
  *                kill window overlaps the fold publish/finalize path.
  *
  * Crash-replay correctness depends entirely on each store's recorded
  * batch id and its commit protocol (staged exclusive rename on posix
  * roots, conditional-PUT commit objects on `objsim://` roots — the
  * simulated object store is registered unconditionally so the SAME child
  * binary drills both). Every restart replays from batch 0, exactly like
  * a restarted streaming query replaying its checkpointed offsets:
  * already-committed batches must be skipped, the interrupted batch must
  * re-merge onto the last complete state.
  *
  * Emits `BATCH_START <b>` / `BATCH_DONE <b>` lines on stdout — the
  * drill's kill scheduler keys off them, and a START without a DONE is
  * the proof a kill landed inside a merge (non-vacuous).
  *
  * Args: `<maintainer> <stateRoot> <opsDir> <nBatches>`; op slices at
  * `<opsDir>/b=<i>` (plus `<opsDir>/cents` for ivf).
  */
object DriverLossChild {

  def main(args: Array[String]): Unit = {
    val Array(maintainer, stateRoot, opsDir, nBatchesS) = args
    val nBatches = nBatchesS.toInt
    val builder = GraftSession.builder(4)
      .master("local[4]")
      .appName(s"driver-loss-child-$maintainer")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop." + graft.streaming.ObjStoreSimFs.ImplConfKey,
        graft.streaming.ObjStoreSimFs.ImplClass)
    if (maintainer == "ivf") // fold on nearly every batch: the risky window
      builder.config(graft.streaming.IncrementalIvf.MaxDeltaDirsKey, "2")
    // fileobj drill mode: force the object committer onto the posix state
    // root — the drill parent sets this env on the child it SIGKILLs
    sys.env.get("SPARK_GRAFT_DRILL_COMMITTER").foreach(c =>
      builder.config(graft.streaming.SnapshotStore.CommitterConfKey, c))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cents =
      if (maintainer == "ivf") Some(spark.read.parquet(s"$opsDir/cents").persist())
      else None
    (0 until nBatches).foreach { b =>
      val ops = spark.read.parquet(s"$opsDir/b=$b")
      println(s"BATCH_START $b"); System.out.flush()
      maintainer match {
        case "agg" => graft.streaming.IncrementalAgg.merge(ops, b.toLong, stateRoot)
        case "gapfill" => graft.streaming.IncrementalGapFill.merge(ops, b.toLong, stateRoot)
        case "scd" => graft.streaming.ScdHistory.merge(ops, b.toLong, stateRoot)
        case "shard" =>
          graft.streaming.IncrementalShardManifest.merge(ops, b.toLong, stateRoot)
        case "ivf" =>
          graft.streaming.IncrementalIvf.merge(ops, cents.get, b.toLong, stateRoot)
        case other => sys.error(s"unknown maintainer '$other'")
      }
      println(s"BATCH_DONE $b"); System.out.flush()
    }
    spark.stop()
  }
}
