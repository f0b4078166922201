package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Real video bytes through the m02/m08 dataflows: MJPEG AVIs round-trip
  * the RIFF container, stride sampling decodes only the sampled frames,
  * and pHash scene-cut detection finds exactly the planted cut. */
class VideoCodecSpec extends AnyFunSuite {

  private val W = 64

  /** Spectrally dense per-scene content (the ImageCodecSpec rationale:
    * every low-frequency bin carries energy so the pHash median split is
    * stable), plus a tiny per-frame brightness drift so consecutive
    * frames are not byte-identical. */
  private def scenePixel(scene: Int, frame: Int)(x: Int, y: Int): Int = {
    var v = 128.0 + frame // small per-frame brightness drift (DC only —
    // the pHash drops the DC term, so within-scene hashes barely move)
    for (u <- 0 until 8; w2 <- 0 until 8; if u + w2 > 0) {
      val amp = 90.0 / ((1 + u + w2) * (1 + u + w2))
      val ph = (scene * 31 + u * 7 + w2 * 13) % 17 * 0.37
      v += amp * math.cos(math.Pi * u * (x + 0.5) / W + ph) *
        math.cos(math.Pi * w2 * (y + 0.5) / W - ph)
    }
    math.max(0, math.min(255, v.toInt))
  }

  private def clip(scenes: Seq[(Int, Int)], fps: Int = 10): Array[Byte] = {
    val jpegs = scenes.flatMap { case (scene, n) =>
      (0 until n).map(f => VideoCodec.encodeJpeg(W, W, scenePixel(scene, f)))
    }
    VideoCodec.encodeAviMjpeg(W, W, fps, jpegs)
  }

  test("corrupt AVI chunk sizes fail fast with a diagnosis (no infinite " +
      "loop on a negative .toInt size, no raw copyOfRange error)") {
    val good = clip(Seq((1, 3)))
    // oversized: first chunk after the RIFF header claims more bytes than
    // remain in the buffer
    val oversized = good.clone()
    oversized(16) = 0xFF.toByte; oversized(17) = 0xFF.toByte
    oversized(18) = 0xFF.toByte; oversized(19) = 0x7E.toByte
    val e1 = intercept[IllegalArgumentException](VideoCodec.parseAvi(oversized))
    assert(e1.getMessage.contains("truncated/corrupt AVI"))
    // size ≥ 2^31: u32(...).toInt goes negative — without the guard the
    // walk offset stops advancing and the parser loops forever
    val negative = good.clone()
    negative(16) = 0.toByte; negative(17) = 0.toByte
    negative(18) = 0.toByte; negative(19) = 0x80.toByte
    val e2 = intercept[IllegalArgumentException](VideoCodec.parseAvi(negative))
    assert(e2.getMessage.contains("truncated/corrupt AVI"))
    // truncation mid-chunk is also a clean failure
    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length - 7)
    val e3 = intercept[IllegalArgumentException](VideoCodec.parseAvi(truncated))
    assert(e3.getMessage.contains("truncated/corrupt AVI"))
  }

  test("AVI round-trip: container metadata and every MJPEG frame survive") {
    val avi = clip(Seq((2, 7), (3, 5)))
    val parsed = VideoCodec.parseAvi(avi)
    assert(parsed.width == W && parsed.height == W)
    assert(parsed.usPerFrame == 100000L) // 10 fps
    assert(parsed.frames.size == 12)
    // frames decode as real JPEGs with near-lossless gray content
    val (w, h, gray) = ImageCodec.decodeGray(parsed.frames.head)
    assert(w == W && h == W)
    val err = (0 until W * W).map(i =>
      math.abs(gray(i) - scenePixel(2, 0)(i % W, i / W))).sum.toDouble / (W * W)
    assert(err < 4.0, s"JPEG round-trip mean abs error $err")
    // byte payloads are genuinely distinct frames, not one repeated
    assert(parsed.frames.map(_.toSeq).distinct.size == 12)
  }

  test("stride sampling decodes ceil(n/stride) frames at the right indices " +
      "(the m02 semantics on a real container)") {
    val avi = clip(Seq((1, 12)))
    val sampled = VideoCodec.sampleFrames(avi, stride = 4)
    assert(sampled.map(_._1) == Vector(0, 4, 8))
    assert(sampled.forall(_._2.length == W * W))
    val all = VideoCodec.sampleFrames(avi, stride = 1)
    assert(all.size == 12)
  }

  test("pHash keyframes find exactly the planted scene cut; within-scene " +
      "drift stays below the jump threshold") {
    val avi = clip(Seq((2, 6), (3, 6)))
    assert(VideoCodec.keyframes(avi) == Vector(0, 6))
    // a single-scene clip keys only frame 0
    assert(VideoCodec.keyframes(clip(Seq((4, 8)))) == Vector(0))
  }

  test("the codec runs as an executor-side kernel over a payload column " +
      "(the multimodal ingest shape)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("video-codec-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val rows = Seq(
        (1L, clip(Seq((1, 6)))),
        (2L, clip(Seq((2, 4), (3, 4)))),
        (3L, clip(Seq((4, 3), (5, 3), (6, 3)))))
      val nKeys = udf((b: Array[Byte]) => VideoCodec.keyframes(b).size)
      val nFrames = udf((b: Array[Byte]) => VideoCodec.parseAvi(b).frames.size)
      val got = rows.toDF("doc_id", "payload").repartition(3)
        .select($"doc_id", nFrames($"payload").as("n_frames"),
          nKeys($"payload").as("n_scenes"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toVector
      assert(got == Vector((1L, 6, 1), (2L, 8, 2), (3L, 9, 3)))
    } finally spark.stop()
  }
}
