package graft.streaming

import graft.analytics.VideoCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming VIDEO near-dup gate on REAL container bytes: arriving AVI
  * payloads are parsed with the RIFF codec, per-frame pHashed, and
  * matched by m09's consecutive-frame-triple shingles against the static
  * corpus index — re-muxed, re-encoded, and trimmed copies flag; fresh
  * clips pass; verdicts identical across micro-batchings. */
class IngestVideoDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-video-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val W = 64

  /** Spectrally rich per-(scene, frame) content (the ImageCodecSpec
    * recipe — coefficients land away from the pHash median split, so
    * hashes are stable under JPEG noise and distinct across scenes). */
  private def framePixel(scene: Int, f: Int, noisy: Boolean = false)(
      x: Int, y: Int): Int = {
    val g = scene * 7 + f
    val fx = (g % 3) + 1
    val fy = (g % 5) + 1
    val v = 128.0 +
      40 * math.sin(fx * math.Pi * x / W + g) * math.cos(fy * math.Pi * y / W - g) +
      25 * math.sin(2 * fx * math.Pi * x / W + 1.3 * g) +
      20 * math.cos(3 * fy * math.Pi * y / W + 0.7 * g) +
      15 * math.sin((g % 4 + 1) * math.Pi * (x + y) / W) +
      (x - y) * 0.4
    val base = math.max(0, math.min(255, v.toInt))
    if (noisy && (x + y * 7) % 509 == 0) math.min(255, base + 3) else base
  }

  private def clipJpegs(scene: Int, n: Int, noisy: Boolean = false) =
    (0 until n).map(f => VideoCodec.encodeJpeg(W, W, framePixel(scene, f, noisy)))

  private def clip(scene: Int, n: Int, noisy: Boolean = false,
      fps: Int = 10): Array[Byte] =
    VideoCodec.encodeAviMjpeg(W, W, fps, clipJpegs(scene, n, noisy))

  // corpus: clip 1 = scene 1 × 8 frames, clip 2 = scene 2 × 6 frames
  private def corpus = {
    import spark.implicits._
    Seq((1L, clip(1, 8)), (2L, clip(2, 6))).toDF("video_id", "payload")
  }

  // arrivals:
  //  101 = RE-MUX of clip 1 (identical JPEG payloads, new container, new
  //        fps) — frame hashes identical, every triple matches
  //  102 = RE-RENDER of clip 2 with pixel noise (pHash drifts a bit or
  //        two per frame) — band shingles still collide, Hamming verifies
  //  103 = fresh scene — must pass
  //  104 = TRIM of clip 1 (frames 2..6) — a shared run of 5 frames
  //  105 = 2-frame stub — no triple, must get a clean verdict row
  private def arrivals = Seq(
    (101L, VideoCodec.encodeAviMjpeg(W, W, 25,
      VideoCodec.parseAvi(clip(1, 8)).frames)),
    (102L, clip(2, 6, noisy = true)),
    (103L, clip(9, 7)),
    (104L, VideoCodec.encodeAviMjpeg(W, W, 10,
      VideoCodec.parseAvi(clip(1, 8)).frames.slice(2, 7))),
    (105L, clip(4, 2)))

  private type Verdict = (Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"video_id", $"n_neardups", $"neardup")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: re-muxed, re-rendered, and trimmed clips flag against " +
      "their corpus originals; fresh content and stubs pass") {
    import spark.implicits._
    val idx = IngestVideoDedup.corpusIndex(corpus).persist()
    try {
      val out = IngestVideoDedup.flagBatch(arrivals.toDF("video_id", "payload"), idx)
      val v = verdicts(out)
      assert(v.contains((101L, 1L, true)), s"re-mux must flag: $v")
      assert(v.contains((102L, 1L, true)), s"noisy re-render must flag: $v")
      assert(v.exists { case (id, n, f) => id == 103L && n == 0L && !f },
        s"fresh clip must pass: $v")
      assert(v.contains((104L, 1L, true)), s"trimmed sub-run must flag: $v")
      assert(v.exists { case (id, _, f) => id == 105L && !f },
        s"2-frame stub must pass with a verdict row: $v")
      // best-match attribution and m09's containment on the exact re-mux:
      // all 6 of the re-mux's triples are shared -> containment 10000
      val r101 = out.filter($"video_id" === 101L)
        .select($"nearest_video", $"containment_q").head()
      assert(r101.getLong(0) == 1L)
      assert(r101.getLong(1) == 10000L)
      // the trim shares 3 of its 3 triples with clip 1
      val r104 = out.filter($"video_id" === 104L)
        .select($"nearest_video", $"containment_q").head()
      assert(r104.getLong(0) == 1L)
      assert(r104.getLong(1) == 10000L)
    } finally idx.unpersist()
  }

  test("stream over micro-batches == one-shot batch; every arrival gets " +
      "a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = IngestVideoDedup.corpusIndex(corpus).persist()
    try {
      val stream = MemoryStream[(Long, Array[Byte])]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestVideoDedup.start(
        stream.toDS().toDF("video_id", "payload"), idx,
        java.nio.file.Files.createTempDirectory("video-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(arrivals.take(2))
      q.processAllAvailable()
      stream.addData(arrivals.drop(2))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestVideoDedup.flagBatch(
        arrivals.toDF("video_id", "payload"), idx))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L, 104L, 105L))
    } finally idx.unpersist()
  }

  test("a malformed payload does not take down the batch: the codec error " +
      "surfaces as an empty shingle set, the clip just passes") {
    import spark.implicits._
    val idx = IngestVideoDedup.corpusIndex(corpus).persist()
    try {
      val junk = Array.fill[Byte](64)(0x5A)
      val out = IngestVideoDedup.flagBatch(
        Seq((201L, junk)).toDF("video_id", "payload"), idx)
      val v = verdicts(out)
      assert(v.exists { case (id, _, f) => id == 201L && !f }, s"$v")
    } finally idx.unpersist()
  }
}
