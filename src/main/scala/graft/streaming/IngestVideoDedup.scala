package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time VIDEO near-duplicate gate — the sequence member of the
  * ingest-media family ([[IngestMediaDedup]] is the per-image pHash gate):
  * each ARRIVING clip (opaque `binary` AVI payload) is parsed with the
  * real container codec ([[graft.analytics.VideoCodec.parseAvi]]), every
  * frame is fingerprinted with the 64-bit DCT pHash
  * ([[graft.analytics.ImageCodec.phash64]]), and the clip is indexed by
  * its CONSECUTIVE-FRAME-TRIPLE shingles — m09's semantics
  * (`Multimodal.scala` m09_sequence_neardup) on real bytes: two clips
  * match when they share a run of 3 aligned frames, which survives
  * re-muxing, concatenation, and trims where a whole-file checksum dies.
  *
  * Matching is Hamming-tolerant so a re-encoded copy (JPEG noise drifts a
  * few pHash bits per frame) still flags:
  *  - each triple emits 4 BAND shingles — band k of a triple is the
  *    16-bit slice k of each of its three frame hashes packed into one
  *    48-bit key — so two aligned triples collide whenever SOME band is
  *    clean across all three frame pairs (drift ≤ 1 bit per frame
  *    guarantees it by pigeonhole: ≤ 3 dirty bands across the triple
  *    leave ≥ 1 of 4 clean; in practice light re-encode noise flips
  *    0–2 bits per frame);
  *  - band-colliding candidates VERIFY by exact per-frame Hamming on the
  *    full 64-bit hashes (all three frames ≤ `maxHamming`) — the media
  *    gates' verify-before-emit contract, so the flag means "truly
  *    shares a 3-frame run within tolerance", never "a band collided".
  *
  * Scale shape, per micro-batch (all contact against STATIC sides):
  *  1. parse + per-frame decode + DCT + shingling is ONE per-row kernel
  *     over the batch (no window, no shuffle — the triple window is
  *     per-clip and runs inside the UDF, bounded by the clip's own frame
  *     count); the corpus is NEVER re-decoded — its shingle index is the
  *     persisted build, ~40 bytes/triple vs MB payloads;
  *  2. the only corpus-wide contact is the (band, key) equi-join, and the
  *     index is DF-capped at build (df ≤ 32 per shingle key — a hot
  *     intro/outro frame run every clip shares cannot quadratically
  *     explode the join; the d02/m09 cap argument);
  *  3. verify work ∝ |candidates|: three xor/popcounts per pair.
  */
object IngestVideoDedup {

  private val Bands = 4
  private val DfCap = 32

  /** (band, packed 48-bit band key, full triple hashes, clip triple count)
    * — one row per (distinct triple) × band. */
  private[streaming] case class Shingle(k: Int, key: Long, h0: Long,
      h1: Long, h2: Long, n_triples: Int)

  private def clipShingles(payload: Array[Byte]): Seq[Shingle] = {
    val hashes =
      // Exception, not just IllegalArgumentException: a well-formed RIFF
      // wrapping a truncated JPEG frame makes ImageIO throw IIOException —
      // a malformed payload must not take down the micro-batch (the same
      // contract the audio twin keeps)
      try graft.analytics.VideoCodec.parseAvi(payload).frames
        .map(graft.analytics.ImageCodec.phash64)
      catch { case _: Exception => Vector.empty }
    val triples = hashes.iterator.sliding(3).withPartial(false)
      .map(t => (t(0), t(1), t(2))).toVector.distinct
    def band(h: Long, k: Int): Long = (h >>> (k * 16)) & 0xFFFFL
    triples.flatMap { case (h0, h1, h2) =>
      (0 until Bands).map { k =>
        Shingle(k, (band(h0, k) << 32) | (band(h1, k) << 16) | band(h2, k),
          h0, h1, h2, triples.size)
      }
    }
  }

  private val shinglesUdf = udf((b: Array[Byte]) => clipShingles(b))

  private def shingleRows(clips: DataFrame, idCol: String): DataFrame =
    clips.select(col(idCol), explode(shinglesUdf(col("payload"))).as("s"))
      .select(col(idCol), col("s.k"), col("s.key"),
        col("s.h0"), col("s.h1"), col("s.h2"), col("s.n_triples"))

  /** Corpus side: the DF-capped shingle index from (video_id, payload) —
    * built once, persisted/written by the caller; the per-clip decode
    * happens exactly once, here. Keys shared by more than [[DfCap]] clips
    * are dropped AT BUILD (boilerplate frame runs), so every later batch
    * join is capped for free. */
  def corpusIndex(corpus: DataFrame): DataFrame = {
    val rows = shingleRows(corpus, "video_id")
    val hot = rows.groupBy(col("k"), col("key"))
      .agg(countDistinct(col("video_id")).as("df"))
      .filter(col("df") > DfCap)
      .select(col("k"), col("key"))
    rows.join(hot, Seq("k", "key"), "left_anti")
  }

  private def verdicts(arrivals: DataFrame, arr: DataFrame,
      corpusIdx: DataFrame, maxHamming: Int): DataFrame = {
    val corpus = corpusIdx.select(col("video_id").as("corpus_id"),
      col("k"), col("key"), col("h0").as("c0"), col("h1").as("c1"),
      col("h2").as("c2"), col("n_triples").as("nc"))
    def ham(a: String, b: String) =
      bit_count(col(a).bitwiseXOR(col(b))).cast("long")
    val cands = arr.join(corpus, Seq("k", "key"))
      // one row per (pair, corpus triple): bands that both matched on the
      // same triple collapse here, so n_shared counts TRIPLES, not bands
      .select(col("new_id"), col("corpus_id"),
        col("h0"), col("h1"), col("h2"), col("c0"), col("c1"), col("c2"),
        col("n_triples").as("nn"), col("nc"))
      .distinct()
      .withColumn("ok",
        ham("h0", "c0") <= maxHamming && ham("h1", "c1") <= maxHamming &&
          ham("h2", "c2") <= maxHamming)
    val perPair = cands.filter(col("ok"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(countDistinct(struct(col("c0"), col("c1"), col("c2"))).as("n_shared"),
        first(col("nn")).as("nn"), first(col("nc")).as("nc"))
      // m09's quantized containment: shared triples over the smaller clip
      .withColumn("containment_q",
        expr("n_shared * 10000 div least(nn, nc)"))
    arrivals.select(col("video_id")).distinct()
      .join(cands.groupBy(col("new_id").as("video_id"))
        .agg(count(lit(1)).as("n_candidates")), Seq("video_id"), "left")
      .join(perPair.groupBy(col("new_id").as("video_id")).agg(
        count(lit(1)).as("n_neardups"),
        // best match: most shared triples, ties to the smallest id —
        // sort-free max(struct) with negated tie field. containment_q
        // RIDES the same pick (it never decides it: (ns, nid) is already
        // unique per pair), so the reported containment describes the
        // reported nearest_video, not some other corpus clip's maximum
        max(struct(col("n_shared").as("ns"), (-col("corpus_id")).as("nid"),
          col("containment_q").as("cq"))).as("best")), Seq("video_id"), "left")
      .withColumn("nearest_video", -col("best.nid"))
      .withColumn("containment_q", col("best.cq"))
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_neardups", coalesce(col("n_neardups"), lit(0L)))
      .withColumn("neardup", col("n_neardups") > 0L)
      .drop("best")
  }

  /** The verdict as a PURE PLAN (no caching) — what a scale-shape spec
    * inspects: corpus contact only via the DF-capped index join. */
  def flagPlan(arrivals: DataFrame, corpusIdx: DataFrame,
      maxHamming: Int = 3): DataFrame =
    verdicts(arrivals,
      shingleRows(arrivals, "video_id").withColumnRenamed("video_id", "new_id"),
      corpusIdx, maxHamming)

  def flagBatch(arrivals: DataFrame, corpusIdx: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    // the shingle rows feed the candidate join AND the per-arrival
    // aggregates — cache so each clip decodes once per batch, then cut
    // the verdict's lineage and drop the cache (the IngestMediaDedup
    // pattern)
    val arr = shingleRows(arrivals, "video_id")
      .withColumnRenamed("video_id", "new_id").persist()
    try graft.GraftSession.materialize(
      verdicts(arrivals, arr, corpusIdx, maxHamming))
    finally arr.unpersist()
  }

  /** Run the gate over a stream of (video_id, payload): each micro-batch
    * is flagged against the static index and handed to `sink`. */
  def start(stream: DataFrame, corpusIdx: DataFrame, checkpoint: String,
      maxHamming: Int = 3)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, corpusIdx, maxHamming), id)
      }
      .start()
}
