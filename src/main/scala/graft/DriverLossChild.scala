package graft

/** The writer PROCESS the driver-loss drill SIGKILLs: a minimal
  * foreachBatch-shaped loop that replays a pre-written op log through
  * [[graft.streaming.IncrementalAgg.merge]] — the NON-idempotent
  * (delta-applying) maintainer, where crash-replay correctness depends
  * entirely on the `_COMMIT`-recorded batch id and the staged exclusive
  * version publish. Every restart replays from batch 0, exactly like a
  * restarted streaming query replaying its checkpointed offsets: already
  * committed batches must be skipped, the batch the kill interrupted must
  * re-merge onto the last complete version.
  *
  * Emits `BATCH_START <b>` / `BATCH_DONE <b>` lines on stdout — the
  * drill's kill scheduler keys off them, and a START without a DONE is
  * the proof a kill landed inside a merge (non-vacuous).
  *
  * Args: `<stateRoot> <opsDir> <nBatches>`; op slices at `<opsDir>/b=<i>`.
  */
object DriverLossChild {

  def main(args: Array[String]): Unit = {
    val Array(stateRoot, opsDir, nBatchesS) = args
    val nBatches = nBatchesS.toInt
    val spark = GraftSession.builder(4)
      .master("local[4]")
      .appName("driver-loss-child")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (0 until nBatches).foreach { b =>
      val ops = spark.read.parquet(s"$opsDir/b=$b")
      println(s"BATCH_START $b"); System.out.flush()
      graft.streaming.IncrementalAgg.merge(ops, b.toLong, stateRoot)
      println(s"BATCH_DONE $b"); System.out.flush()
    }
    spark.stop()
  }
}
