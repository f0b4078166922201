package graft.streaming

import graft.cdc._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}

/** The COMPLETE loop, Spark on both ends of the real wire: binlog fixture
  * → Replay (ChangeStream filters + FragmentingProducer + the Kafka sink
  * over real Produce frames) → KafkaBroker → `readStream.format
  * ("graft-topic")` (seq-dedup decode) → consumed rows. The consumed
  * stream must be the produced operation stream EXACTLY ONCE and in the
  * W1 total order — the composition the reference runs in production
  * (dolphinbeat produces, the client library consumes). */
class FullLoopSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("full-loop-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val fixture = Paths.get("fixtures/canal_test.jsonl")

  test("produce over the real Kafka wire, consume with the graft-topic " +
      "source: exactly once, in order, byte-equal JSON") {
    val broker = new graft.kafka.KafkaBroker().start()
    try {
      val addr = s"kafka://127.0.0.1:${broker.port}/ops"
      val out = Files.createTempDirectory("fullloop")
      val stats = Replay.run(spark, fixture, out, topicAddr = Some(addr))
      assert(stats.wireMessages > 0)

      // ground truth: decode the topic directly with the library decoder
      val expected: Vector[String] = {
        val c = new graft.kafka.KafkaTopicClient("127.0.0.1", broker.port, "ops")
        try {
          val dec = new OperationDecoder
          c.fetchFrom(0L).flatMap { case (off, d) =>
            dec.feed(d, off).toSeq.flatMap(_.ops)
          }.map(OperationJson.render)
        } finally c.close()
      }
      assert(expected.nonEmpty)

      val q = spark.readStream.format("graft-topic")
        .option("addr", addr)
        .load()
        .writeStream.format("memory").queryName("fullloop").outputMode("append")
        .start()
      try {
        val deadline = System.nanoTime() + 60_000_000_000L
        def rows() = spark.sql(
          "SELECT op_idx, op_json FROM fullloop ORDER BY op_idx").collect()
        while (rows().length < expected.size && System.nanoTime() < deadline)
          Thread.sleep(100)
        val got = rows()
        assert(got.length == expected.size, "exactly-once: no dups, no gaps")
        assert(got.map(_.getLong(0)).toVector == expected.indices.map(_.toLong))
        assert(got.map(_.getString(1)).toVector == expected,
          "consumed JSON must be byte-equal to the produced op stream in order")
      } finally q.stop()
    } finally broker.close()
  }
}
