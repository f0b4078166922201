package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The real-codec drill for the m-series stub seam: REAL PNG bytes (JDK
  * `javax.imageio`, encoded in-test) driven through the SAME Spark-side
  * plumbing the md5-stub queries pin — binary payload column, per-image
  * decode on executors, 64-bit fingerprint → 4×16-bit band join → verified
  * near-dup pairs (m05's dataflow), area-average thumbnails (m03's), and
  * batched per-partition feature extraction (m04's). What the stub could
  * not prove and this does: a pixel-space perturbation (what a codec
  * actually sees) keeps a SMALL Hamming distance under the DCT pHash,
  * while distinct content lands far apart — the md5 stand-in has no such
  * metric structure.
  */
class ImageCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("image-codec-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val W = 64

  /** Spectrally RICH low-frequency content per group: a single sinusoid
    * would leave most of the 63 pHash coefficients at ~0 (= the median),
    * where every bit is fragile; summing several strong components pushes
    * the coefficients well away from the median split, like a natural
    * image's broad spectrum. Deterministic per group. */
  private def basePixel(g: Int)(x: Int, y: Int): Int = {
    val fx = (g % 3) + 1
    val fy = (g % 5) + 1
    val v = 128.0 +
      40 * math.sin(fx * math.Pi * x / W + g) * math.cos(fy * math.Pi * y / W - g) +
      25 * math.sin(2 * fx * math.Pi * x / W + 1.3 * g) +
      20 * math.cos(3 * fy * math.Pi * y / W + 0.7 * g) +
      15 * math.sin((g % 4 + 1) * math.Pi * (x + y) / W) +
      (x - y) * 0.4
    math.max(0, math.min(255, v.toInt))
  }

  /** The near-dup: same content with a mild, sparse perturbation (a few
    * pixels nudged — DCT coefficients near the median split are fragile,
    * so the noise must stay below the banding threshold by design). */
  private def noisyPixel(g: Int)(x: Int, y: Int): Int = {
    val v = basePixel(g)(x, y)
    if ((x + y * 7) % 509 == 0) math.min(255, v + 3) else v
  }

  test("decode + resize are exact and deterministic (m03's real path)") {
    val png = ImageCodec.encodePng(W, W, (x, _) => x * 4 % 256)
    val (w, h, gray) = ImageCodec.decodeGray(png)
    assert(w == W && h == W)
    // PNG is lossless and luma of (g,g,g) is g: pixels decode exactly
    assert(gray(5) == 20 && gray(W + 9) == 36)
    val thumb = ImageCodec.resizeGray(gray, w, h, 8, 8)
    assert(thumb.length == 64)
    // area average of an x-gradient: each 8-wide column block averages
    // its own gray values — strictly increasing left to right
    val firstRow = thumb.take(8)
    assert(firstRow.sliding(2).forall(p => p(0) < p(1)), firstRow.toSeq.toString)
    // byte-identical input → identical output
    assert(ImageCodec.resizeGray(gray, w, h, 8, 8).toSeq == thumb.toSeq)
  }

  test("DCT pHash: re-encode and mild pixel noise stay near; distinct " +
      "content lands far (the metric the md5 stub cannot have)") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val a1 = ImageCodec.phash64(ImageCodec.encodePng(W, W, basePixel(1)))
    val a2 = ImageCodec.phash64(ImageCodec.encodePng(W, W, noisyPixel(1)))
    val a3 = ImageCodec.phash64(
      ImageCodec.encodePng(W, W, basePixel(1))) // re-encode, same pixels
    val b1 = ImageCodec.phash64(ImageCodec.encodePng(W, W, basePixel(2)))
    assert(a1 == a3, "same pixels must hash identically")
    assert(hamming(a1, a2) <= 3, s"noise moved the hash ${hamming(a1, a2)} bits")
    assert(hamming(a1, b1) >= 16, s"distinct content only ${hamming(a1, b1)} apart")
  }

  /** Spectrally DENSE content — energy at EVERY low-frequency bin with
    * 1/f² amplitudes and deterministic per-group phases, a natural
    * image's broad spectrum. The sparse [[basePixel]] fixture leaves ~57
    * of the 63 pHash coefficients near zero where the median split is
    * fragile, so ANY resample flips ~16 bits (even pure downscales);
    * scale-robustness claims need the dense fixture. */
  private def densePixel(g: Int)(x: Int, y: Int): Int = {
    var v = 128.0
    for (u <- 0 until 8; w2 <- 0 until 8; if u + w2 > 0) {
      val amp = 90.0 / ((1 + u + w2) * (1 + u + w2))
      val ph = (g * 31 + u * 7 + w2 * 13) % 17 * 0.37
      v += amp * math.cos(math.Pi * u * (x + 0.5) / W + ph) *
        math.cos(math.Pi * w2 * (y + 0.5) / W - ph)
    }
    math.max(0, math.min(255, v.toInt))
  }

  test("a sub-32px thumbnail pHashes within the near-dup gate of its " +
      "original (the resize UPSCALE path: target cells with no mapped " +
      "source pixel must replicate, not stay black)") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (g <- 1 to 3) {
      val full = ImageCodec.encodePng(W, W, densePixel(g))
      val (w, h, gray) = ImageCodec.decodeGray(full)
      val small = ImageCodec.resizeGray(gray, w, h, 16, 16)
      val thumb = ImageCodec.encodePng(16, 16, (x, y) => small(y * 16 + x))
      // pre-fix, the 16→32 upscale left every odd row/column BLACK and
      // these landed 12–20 bits away; post-fix they sit at 0–2
      val d = hamming(ImageCodec.phash64(full), ImageCodec.phash64(thumb))
      assert(d <= 3, s"16px thumbnail of pattern $g landed $d bits away")
    }
    // and distinct dense content still lands far
    val h2 = ImageCodec.phash64(ImageCodec.encodePng(W, W, densePixel(2)))
    val h3 = ImageCodec.phash64(ImageCodec.encodePng(W, W, densePixel(3)))
    assert(hamming(h2, h3) >= 16)
  }

  test("end-to-end over Spark: real PNG payloads → executor decode → " +
      "banded pHash join finds exactly the planted near-dup pairs (m05's " +
      "dataflow on real bytes)") {
    import spark.implicits._
    // 8 groups × (base, noisy) = 16 images; near-dups are within-group
    val rows = (0 until 8).flatMap { g =>
      Seq((g * 2L, ImageCodec.encodePng(W, W, basePixel(g))),
        (g * 2L + 1, ImageCodec.encodePng(W, W, noisyPixel(g))))
    }
    val df = rows.toDF("doc_id", "payload").repartition(4)
    val ph = udf((b: Array[Byte]) => ImageCodec.phash64(b))
    val bandCols = Seq($"doc_id", $"h") ++
      (0 until 4).map(k =>
        shiftrightunsigned($"h", k * 16).bitwiseAND(lit(0xFFFFL)).as(s"b$k"))
    val withBands = df.select($"doc_id", ph($"payload").as("h"))
      .select(bandCols: _*)
      .persist()
    val hammingC = bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long")
    def band(k: Int) = withBands.as("a")
      .join(withBands.as("b"),
        col(s"a.b$k") === col(s"b.b$k") && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"), hammingC.as("hamming"))
      .filter($"hamming" <= 3)
    val pairs = (0 until 4).map(band).reduce(_ unionAll _).distinct()
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    // hamming ≤ 3 over 4 bands ⇒ pigeonhole guarantees a clean band, so
    // banding has NO recall loss at this threshold — exactly the planted
    // within-group pairs, nothing across groups
    assert(pairs == (0 until 8).map(g => (g * 2L, g * 2L + 1)).toSet)
    withBands.unpersist()
  }

  test("batched per-partition feature extraction (m04's real path): " +
      "histogram mass equals pixel count, batch shape preserved") {
    import spark.implicits._
    val rows = (0 until 6).map(g =>
      (g.toLong, ImageCodec.encodePng(W, W, basePixel(g))))
    val df = rows.toDF("doc_id", "payload").repartition(3)
    val feats = df.as[(Long, Array[Byte])].mapPartitions { it =>
      // batch shape: decode the whole partition in one pass, emit one
      // row per image — the mapInPandas-equivalent batching contract
      it.map { case (id, bytes) =>
        val (hist, mean) = ImageCodec.grayFeatures(bytes)
        (id, hist, mean)
      }
    }.toDF("doc_id", "hist", "mean_gray").collect()
    assert(feats.length == 6)
    feats.foreach { r =>
      val hist = r.getSeq[Long](1)
      assert(hist.length == 16)
      assert(hist.sum == W * W, "histogram mass must equal pixel count")
      val mean = r.getLong(2)
      assert(mean > 0 && mean < 256)
    }
  }
}
