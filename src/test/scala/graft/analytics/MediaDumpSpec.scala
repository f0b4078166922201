package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The oracle-dump protocol behind mediaFeatures/mediaFingerprints: the
  * once-per-JVM gate must UNMARK on a failed write (or every later query
  * silently skips re-dumping and the DuckDB oracle reads a torn/absent
  * dump), and the dump itself publishes via per-process temp dir + atomic
  * rename, so the destination is never a half-written parquet job. */
class MediaDumpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("media-dump-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("dumpOnce unmarks the dir when the write throws, so the next call " +
      "retries instead of skipping the dump forever") {
    val dumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    var calls = 0
    intercept[RuntimeException] {
      Multimodal.dumpOnce(dumped, "/d1") { calls += 1; throw new RuntimeException("boom") }
    }
    assert(calls == 1 && !dumped.contains("/d1"),
      "failed write must leave the dir unmarked")
    Multimodal.dumpOnce(dumped, "/d1") { calls += 1 } // retry succeeds
    assert(calls == 2 && dumped.contains("/d1"))
    Multimodal.dumpOnce(dumped, "/d1") { calls += 1 } // now once-per-JVM
    assert(calls == 2)
  }

  test("swapDump publishes atomically: replaces prior content, leaves no " +
      "per-process temp dirs behind") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("swapdump").toString
    val dest = s"$base/dump"
    Multimodal.swapDump(Seq(1L, 2L, 3L).toDF("x"), dest)
    assert(spark.read.parquet(dest).count() == 3)
    // a second publish REPLACES (the re-dump path after a code change)
    Multimodal.swapDump(Seq(4L, 5L).toDF("x"), dest)
    assert(spark.read.parquet(dest).as[Long].collect().toSet == Set(4L, 5L))
    val leftovers = new java.io.File(base).listFiles()
      .map(_.getName).filter(_.startsWith("dump.tmp-"))
    assert(leftovers.isEmpty, s"stray temp dirs: ${leftovers.mkString(",")}")
  }
}
