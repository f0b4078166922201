package graft.streaming

import graft.analytics.ImageCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming media near-dup gate on REAL image bytes: arriving PNG
  * payloads decoded with the JDK codec, pHash-banded against the static
  * corpus fingerprint index, verified by exact Hamming — verdicts
  * identical whether images arrive in one micro-batch or many. */
class IngestMediaDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-media-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val W = 64

  /** Spectrally rich deterministic content per group (ImageCodecSpec's
    * recipe — coefficients land well away from the pHash median split). */
  private def basePng(g: Int, noisy: Boolean = false): Array[Byte] =
    ImageCodec.encodePng(W, W, { (x, y) =>
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
    })

  // corpus: groups 1 and 2
  private def corpus = {
    import spark.implicits._
    Seq((1L, basePng(1)), (2L, basePng(2))).toDF("image_id", "payload")
  }

  // arrivals: 101 = perturbed re-render of image 1 (near-dup), 102 =
  // byte-identical re-encode of image 2 (hamming 0), 103 = fresh content
  private def arrivals = Seq(
    (101L, basePng(1, noisy = true)),
    (102L, basePng(2)),
    (103L, basePng(5)))

  private type Verdict = (Long, Long, Boolean)
  private def verdicts(df: org.apache.spark.sql.DataFrame): Set[Verdict] = {
    import spark.implicits._
    df.select($"image_id", $"n_neardups", $"neardup")
      .as[Verdict].collect().toSet
  }

  test("flagBatch: perturbed and re-encoded images flag against their " +
      "corpus originals; fresh content passes; nearest_image is named") {
    import spark.implicits._
    val idx = IngestMediaDedup.corpusIndex(corpus)
    val out = IngestMediaDedup.flagBatch(arrivals.toDF("image_id", "payload"), idx)
    val v = verdicts(out)
    assert(v.contains((101L, 1L, true)), s"perturbed copy must flag: $v")
    assert(v.contains((102L, 1L, true)), s"re-encode must flag: $v")
    assert(v.exists { case (id, n, f) => id == 103L && n == 0L && !f },
      s"fresh content must pass: $v")
    val nearest = out.filter($"image_id" === 101L)
      .select($"nearest_image").as[Long].head()
    assert(nearest == 1L)
    assert(out.filter($"image_id" === 102L)
      .select($"nearest_image").as[Long].head() == 2L)
  }

  test("stream over micro-batches == one-shot batch; every arrival gets a verdict") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val idx = IngestMediaDedup.corpusIndex(corpus).persist()
    try {
      val stream = MemoryStream[(Long, Array[Byte])]
      val got = collection.mutable.ArrayBuffer.empty[Verdict]
      val q = IngestMediaDedup.start(
        stream.toDS().toDF("image_id", "payload"), idx,
        java.nio.file.Files.createTempDirectory("media-ckp").toString) {
        (flagged, _) => got.synchronized { got ++= verdicts(flagged) }
      }
      stream.addData(arrivals.take(1))
      q.processAllAvailable()
      stream.addData(arrivals.drop(1))
      q.processAllAvailable()
      q.stop()
      val oneShot = verdicts(IngestMediaDedup.flagBatch(
        arrivals.toDF("image_id", "payload"), idx))
      assert(got.toSet == oneShot,
        s"micro-batched verdicts ${got.toSet} != one-shot $oneShot")
      assert(got.map(_._1).toSet == Set(101L, 102L, 103L))
    } finally idx.unpersist()
  }
}
