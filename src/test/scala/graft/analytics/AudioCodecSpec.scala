package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The real-codec drill for the AUDIO side of the m-series stub seam:
  * real WAV bytes (JDK `javax.sound.sampled`, synthesized in-test)
  * driven through m07's VAD segmentation and m12's periodicity shapes.
  * What the md5 stub could not prove and this does: the segments land
  * exactly where silence was synthesized, and the autocorrelation argmax
  * recovers the synthesized beat period — physical structure the hash
  * stand-in has none of.
  */
class AudioCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("audio-codec-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Rate = 8000f
  private val Frame = 400 // 50 ms at 8 kHz

  /** speech-shaped fixture: 3 tone bursts separated by true silence.
    * Bursts cover frames [0,4), [8,12), [16,20) of 20 (400-sample frames). */
  private def burstyWav: Array[Byte] = AudioCodec.encodeWav(8000, Rate, { i =>
    val frame = i / Frame
    val active = (frame / 4) % 2 == 0
    if (active) (8000 * math.sin(2 * math.Pi * 440 * i / Rate)).toInt else 0
  })

  /** beat-shaped fixture: energy pulses every `period` frames (loud one
    * frame, quiet otherwise) — a 4-frame beat over 64 frames. */
  private def beatWav(period: Int): Array[Byte] =
    AudioCodec.encodeWav(64 * Frame, Rate, { i =>
      val frame = i / Frame
      val amp = if (frame % period == 0) 12000 else 500
      (amp * math.sin(2 * math.Pi * 220 * i / Rate)).toInt
    })

  test("WAV decode + frame energies + VAD segmentation find the " +
      "synthesized silence structure (m07's real path)") {
    val samples = AudioCodec.decodePcm16(burstyWav)
    assert(samples.length == 8000)
    val energies = AudioCodec.frameEnergies(samples, Frame)
    assert(energies.length == 20)
    // tone RMS ~ 8000/sqrt(2) ~ 5657; silence exactly 0
    assert(energies(0) > 5000 && energies(0) < 6000)
    assert(energies(5) == 0)
    val segs = AudioCodec.activeSegments(energies, threshold = 100)
    assert(segs == Vector((0, 4), (8, 12), (16, 20)))
  }

  test("energy autocorrelation recovers the synthesized beat period " +
      "(m12's real path), ties resolving to the fundamental") {
    val energies = AudioCodec.frameEnergies(AudioCodec.decodePcm16(beatWav(4)), Frame)
    assert(AudioCodec.dominantLag(energies, 2, 16) == 4)
    val e6 = AudioCodec.frameEnergies(AudioCodec.decodePcm16(beatWav(6)), Frame)
    assert(AudioCodec.dominantLag(e6, 2, 16) == 6)
  }

  test("end-to-end over Spark: WAV payloads → executor decode → per-frame " +
      "explode → gaps-and-islands segment count (m07's dataflow on real bytes)") {
    import spark.implicits._
    // 6 docs: doc k has k+1 active bursts (burst=2 frames, gap=2 frames)
    val rows = (0 until 6).map { k =>
      val frames = (k + 1) * 4
      (k.toLong, AudioCodec.encodeWav(frames * Frame, Rate, { i =>
        val frame = i / Frame
        if (frame % 4 < 2) (9000 * math.sin(2 * math.Pi * 330 * i / Rate)).toInt
        else 0
      }))
    }
    val df = rows.toDF("doc_id", "payload").repartition(3)
    val fs = Frame // local copy: the udf closure must not capture the spec class
    val energiesUdf = udf((b: Array[Byte]) =>
      AudioCodec.frameEnergies(AudioCodec.decodePcm16(b), fs))
    // the m07 dataflow: explode frames, threshold, islands via the
    // (frame_idx - row_number) trick under a PER-DOC window
    val frames = df.select($"doc_id", posexplode(energiesUdf($"payload")).as(Seq("f", "e")))
      .filter($"e" > 100)
    val islands = frames
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id").orderBy($"f")))
      .withColumn("island", $"f" - $"rn")
      .groupBy($"doc_id").agg(countDistinct($"island").as("n_segments"))
      .orderBy($"doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(islands == (0 until 6).map(k => (k.toLong, (k + 1).toLong)))
  }
}
