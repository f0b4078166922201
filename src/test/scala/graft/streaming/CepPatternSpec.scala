package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming CEP == batch e24: the DFA registers must carry partial
  * matches across micro-batch boundaries — an error run split over two
  * batches is ONE burst, an armed conversion split over two batches still
  * completes — and the final cumulative row per user must equal the batch
  * operator on the union of everything delivered. */
class CepPatternSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("cep-pattern-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val types = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
    'e' -> "error", 's' -> "signup")

  private def rows(u: Long, tl: String, t0: Int) = tl.zipWithIndex.map {
    case (ch, i) => (u * 1000L + t0 + i,
      new Timestamp(1700000000000L + (t0 + i) * 60000L), u, types(ch), 1.0, "{}")
  }

  test("DFA step: strict contiguity and burst-run counting") {
    def run(tl: String): (Long, Long) = {
      val r = tl.map(_.toString).foldLeft(
        CepPattern.Registers(false, false, false, 0L, 0L, 0L))(CepPattern.step)
      (r.nConv, r.nBursts)
    }
    assert(run("vccp") == ((1L, 0L)))
    assert(run("vcecp") == ((0L, 0L)))   // error breaks contiguity
    assert(run("vpeeevp") == ((2L, 1L))) // maximal run counts once
    assert(run("eve") == ((0L, 0L)))     // isolated errors: no burst
    assert(run("vvp") == ((1L, 0L)))     // re-arm on second view
    assert(run("eeee") == ((0L, 1L)))    // one maximal run, not three
    assert(run("eesee") == ((0L, 2L)))   // two separated runs
  }

  test("stream: partial matches survive batch boundaries; final rows == batch e24") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // user 1: "vc" | "cp"  -> armed state crosses the boundary, 1 conversion
    // user 2: "ee" | "e"   -> burst already counted; the tail e must NOT
    //                         open a second burst
    // user 3: "e"  | "ev"  -> the run REACHES length 2 only in batch 2
    val b1 = rows(1L, "vc", 0) ++ rows(2L, "ee", 0) ++ rows(3L, "e", 0)
    val b2 = rows(1L, "cp", 10) ++ rows(2L, "e", 10) ++ rows(3L, "ev", 10)

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val got = collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val q = CepPattern.start(
      stream.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      Files.createTempDirectory("cep-ckp").toString) { (batch, _) =>
      batch.collect().foreach { r =>
        got.synchronized {
          got(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3))
        }
      }
    }
    stream.addData(b1.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
    q.processAllAvailable()
    stream.addData(b2.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)))
    q.processAllAvailable()
    q.stop()

    assert(got(1L) == ((4L, 1L, 0L)), s"got: $got")
    assert(got(2L) == ((3L, 0L, 1L)), s"got: $got")
    assert(got(3L) == ((3L, 0L, 1L)), s"got: $got")

    // parity anchor: batch e24 over the union sees the same counts
    val dir = Files.createTempDirectory("cep-batch").toString
    (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val batch = graft.SparkEntry.queries("e24_cep_pattern")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(batch == got.toMap, s"stream $got != batch $batch")
  }
}
