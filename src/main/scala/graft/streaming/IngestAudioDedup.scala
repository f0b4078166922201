package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time AUDIO overlap gate — the third member of the media
  * ingest trio ([[IngestMediaDedup]] image pHash, [[IngestVideoDedup]]
  * video frame-triple shingles): each ARRIVING clip (opaque `binary` WAV
  * payload) is decoded with the real JDK codec
  * ([[graft.analytics.AudioCodec]]), reduced to per-frame RMS energies,
  * and fingerprinted as its LANDMARK CONSTELLATION — m11's Shazam-family
  * semantics (`Multimodal.scala` m11_audio_alignment) on real bytes:
  * (frame_idx, 16-bit envelope-contour hash) pairs, where matching
  * hashes across the arrival and a corpus clip VOTE for their
  * frame-index DIFFERENCE. A true overlap concentrates votes on one
  * offset (a trimmed or padded copy votes at the trim length); chance
  * collisions scatter (expected ≈ nₐ·n_c/2¹⁶ ≈ 0.06 votes per pair at
  * 64-frame clips), so the m11 threshold `votes ≥ 3` IS the statistical
  * verify — the flag answers both "does this clip overlap something in
  * the corpus" and "at WHAT offset".
  *
  * Scale shape, per micro-batch (all contact against STATIC sides):
  *  1. decode + energy + landmark is one per-row kernel over the batch
  *     (no shuffle; the per-clip work is bounded by the clip's own frame
  *     count); the corpus is NEVER re-decoded — its constellation is the
  *     persisted index, ~12 bytes/frame vs KB–MB payloads;
  *  2. the only corpus-wide contact is the 16-bit-hash equi-join, and
  *     the index is DF-capped at build (df ≤ 16 — a silence/boilerplate
  *     landmark every clip shares cannot go quadratic; m11's cap);
  *  3. vote counting is one hash-agg on (new, corpus, offset); the
  *     per-pair argmax is the sort-free max(struct) — no window, no
  *     cartesian.
  */
object IngestAudioDedup {

  private val DfCap = 16
  private val MinVotes = 3

  private[streaming] case class Landmark(frame_idx: Long, h: Int)

  private def clipLandmarks(payload: Array[Byte], frameSize: Int): Seq[Landmark] = {
    val marks =
      try graft.analytics.AudioCodec.landmarks(
        graft.analytics.AudioCodec.frameEnergies(
          graft.analytics.AudioCodec.decodePcm16(payload), frameSize))
      catch { case _: Exception => Array.empty[(Int, Int)] } // not a WAV
    marks.toSeq.map { case (f, h) => Landmark(f.toLong, h) }
  }

  private def landmarkRows(clips: DataFrame, idCol: String,
      frameSize: Int): DataFrame = {
    val lmUdf = udf((b: Array[Byte]) => clipLandmarks(b, frameSize))
    clips.select(col(idCol), explode(lmUdf(col("payload"))).as("l"))
      .select(col(idCol), col("l.frame_idx"), col("l.h"))
  }

  /** Corpus side: the DF-capped landmark index from (audio_id, payload)
    * — built once, persisted/written by the caller; the per-clip decode
    * happens exactly once, here. */
  def corpusIndex(corpus: DataFrame, frameSize: Int = 256): DataFrame = {
    val rows = landmarkRows(corpus, "audio_id", frameSize)
    val hot = rows.groupBy(col("h"))
      .agg(countDistinct(col("audio_id")).as("df"))
      .filter(col("df") > DfCap)
      .select(col("h"))
    rows.join(hot, Seq("h"), "left_anti")
  }

  private def verdicts(arrivals: DataFrame, arr: DataFrame,
      corpusIdx: DataFrame, minVotes: Int): DataFrame = {
    val corpus = corpusIdx.select(col("audio_id").as("corpus_id"), col("h"),
      col("frame_idx").as("fc"))
    val matches = arr.join(corpus, Seq("h"))
    val votes = matches
      .groupBy(col("new_id"), col("corpus_id"),
        (col("fa") - col("fc")).as("off"))
      .agg(count(lit(1)).as("v"))
    val perPair = votes.groupBy(col("new_id"), col("corpus_id"))
      // argmax votes, ties to the smallest offset — sort-free max(struct)
      .agg(max(struct(col("v").as("v"), (-col("off")).as("noff"))).as("m"))
      .select(col("new_id"), col("corpus_id"),
        (-col("m.noff")).as("best_offset"), col("m.v").as("votes"))
      .filter(col("votes") >= minVotes)
    arrivals.select(col("audio_id")).distinct()
      .join(matches.groupBy(col("new_id").as("audio_id"))
        .agg(count(lit(1)).as("n_candidates")), Seq("audio_id"), "left")
      .join(perPair.groupBy(col("new_id").as("audio_id")).agg(
        count(lit(1)).as("n_overlaps"),
        max(struct(col("votes").as("v"), (-col("corpus_id")).as("nid"),
          col("best_offset").as("off"))).as("m")), Seq("audio_id"), "left")
      .withColumn("nearest_audio", -col("m.nid"))
      .withColumn("best_offset", col("m.off"))
      .withColumn("votes", col("m.v"))
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_overlaps", coalesce(col("n_overlaps"), lit(0L)))
      .withColumn("overlap", col("n_overlaps") > 0L)
      .drop("m")
  }

  /** The verdict as a PURE PLAN (no caching) — corpus contact only via
    * the DF-capped landmark index join. */
  def flagPlan(arrivals: DataFrame, corpusIdx: DataFrame,
      frameSize: Int = 256, minVotes: Int = MinVotes): DataFrame =
    verdicts(arrivals,
      landmarkRows(arrivals, "audio_id", frameSize)
        .withColumnRenamed("audio_id", "new_id")
        .withColumnRenamed("frame_idx", "fa"),
      corpusIdx, minVotes)

  def flagBatch(arrivals: DataFrame, corpusIdx: DataFrame,
      frameSize: Int = 256, minVotes: Int = MinVotes): DataFrame = {
    // landmark rows feed the vote join and the per-arrival aggregates —
    // cache so each clip decodes once per batch, cut the verdict's
    // lineage, drop the cache (the IngestMediaDedup pattern)
    val arr = landmarkRows(arrivals, "audio_id", frameSize)
      .withColumnRenamed("audio_id", "new_id")
      .withColumnRenamed("frame_idx", "fa")
      .persist()
    try graft.GraftSession.materialize(
      verdicts(arrivals, arr, corpusIdx, minVotes))
    finally arr.unpersist()
  }

  /** Run the gate over a stream of (audio_id, payload): each micro-batch
    * is flagged against the static index and handed to `sink`. */
  def start(stream: DataFrame, corpusIdx: DataFrame, checkpoint: String,
      frameSize: Int = 256, minVotes: Int = MinVotes)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusIdx, frameSize, minVotes), id)
      }
      .start()
}
