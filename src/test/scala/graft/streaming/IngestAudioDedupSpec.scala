package graft.streaming

import graft.analytics.AudioCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming AUDIO overlap gate on REAL WAV bytes: arriving payloads are
  * decoded with the JDK codec, reduced to frame-energy landmark
  * constellations, and offset-vote matched (m11's Shazam-family
  * semantics) against the static corpus index — identical re-encodes and
  * trimmed copies flag AT THE RIGHT OFFSET, fresh clips pass, verdicts
  * identical across micro-batchings. */
class IngestAudioDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-audio-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Frame = 256
  private val Rate = 8000f
  private val NFrames = 48

  /** Per-(clip, frame) amplitude exponent 0..4 — a deterministic, rich
    * envelope contour; amplitudes sit mid-ilog2-bucket (512·2^p → RMS
    * ≈ 362·2^p) so light sample noise cannot flip a bucket. */
  private def ampExp(clip: Int, f: Int): Int = {
    // avalanche hash, NOT modular arithmetic: (clip*a + f*b) % 5 has
    // shift structure — e.g. f -> f+26 realigned two "different" clips
    // exactly (19 true votes at offset -26), because 26 cancels both the
    // mod-5 linear term and a mod-13 quadratic. Clips must be genuinely
    // contour-unique for the fresh-pass assertion to mean anything.
    var h = clip * 0x9E3779B1 + f * 0x85EBCA77
    h ^= h >>> 13; h *= 0xC2B2AE3D; h ^= h >>> 16
    math.floorMod(h, 5)
  }

  private def clipWav(clip: Int, frames: Int = NFrames,
      skipFrames: Int = 0, noise: Int = 0): Array[Byte] =
    AudioCodec.encodeWav((frames - skipFrames) * Frame, Rate, { i =>
      val f = skipFrames + i / Frame
      val a = 512 << ampExp(clip, f)
      val s = a * math.sin(2 * math.Pi * 220 * i / Rate)
      val n = if (noise > 0) ((i * 2654435761L >>> 16) % (2 * noise + 1) - noise).toInt else 0
      s.toInt + n
    })

  private def corpus = {
    import spark.implicits._
    Seq((1L, clipWav(1)), (2L, clipWav(2))).toDF("audio_id", "payload")
  }

  // arrivals:
  //  101 = byte-identical re-encode of clip 1 — overlap at offset 0
  //  102 = clip 2 TRIMMED by 8 frames — overlap at offset -8
  //  103 = fresh contour — passes
  //  104 = clip 1 with light additive sample noise — buckets hold, flags
  private def arrivals = Seq(
    (101L, clipWav(1)),
    (102L, clipWav(2, skipFrames = 8)),
    (103L, clipWav(9)),
    (104L, clipWav(1, noise = 16)))

  private type Verdict = (Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"audio_id", $"n_overlaps", $"overlap")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: re-encoded, trimmed, and lightly-noised clips flag " +
      "against their corpus originals AT THE RIGHT OFFSET; fresh " +
      "content passes") {
    import spark.implicits._
    val idx = IngestAudioDedup.corpusIndex(corpus).persist()
    try {
      val out = IngestAudioDedup.flagBatch(arrivals.toDF("audio_id", "payload"), idx)
      val v = verdicts(out)
      assert(v.contains((101L, 1L, true)), s"re-encode must flag: $v")
      assert(v.contains((102L, 1L, true)), s"trimmed copy must flag: $v")
      assert(v.exists { case (id, _, f) => id == 103L && !f },
        s"fresh clip must pass: $v")
      assert(v.contains((104L, 1L, true)), s"noised copy must flag: $v")
      def best(id: Long) = out.filter($"audio_id" === id)
        .select($"nearest_audio", $"best_offset", $"votes").head()
      val r101 = best(101L)
      assert(r101.getLong(0) == 1L && r101.getLong(1) == 0L,
        s"identical copy aligns at offset 0: $r101")
      assert(r101.getLong(2) >= (NFrames - 7 - 3).toLong) // nearly every landmark votes
      val r102 = best(102L)
      assert(r102.getLong(0) == 2L && r102.getLong(1) == -8L,
        s"8-frame trim aligns at offset -8: $r102")
      val r104 = best(104L)
      assert(r104.getLong(0) == 1L && r104.getLong(1) == 0L, s"$r104")
    } finally idx.unpersist()
  }

  test("stream over micro-batches == one-shot batch; every arrival gets " +
      "a verdict; junk payloads pass cleanly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = IngestAudioDedup.corpusIndex(corpus).persist()
    try {
      val withJunk = arrivals :+ (201L, Array.fill[Byte](64)(0x5A))
      val stream = MemoryStream[(Long, Array[Byte])]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestAudioDedup.start(
        stream.toDS().toDF("audio_id", "payload"), idx,
        java.nio.file.Files.createTempDirectory("audio-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(withJunk.take(2))
      q.processAllAvailable()
      stream.addData(withJunk.drop(2))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestAudioDedup.flagBatch(
        withJunk.toDF("audio_id", "payload"), idx))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L, 104L, 201L))
      assert(got.exists { case (id, _, f) => id == 201L && !f })
    } finally idx.unpersist()
  }
}
