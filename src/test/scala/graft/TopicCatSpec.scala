package graft

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

/** The kafka-consumer tool twin: decodes a topic into printed operation
  * lines over BOTH wire dialects, with seq/offset prefixes matching the
  * decoder batches and the seq-dedup semantics of the recovery scan. */
class TopicCatSpec extends AnyFunSuite {

  private def insert(logPos: Long, id: Long): Operation = {
    val table = TableDef("test", "t", Vector(
      ColumnDef("id", "int(11)", InnerType.LONG, key = "PRI", nullable = false)))
    Operation(
      OperationHeader(66693, OpType.Insert, 1546300800L, logPos),
      table = Some(table),
      rows = Vector(OpRow(None, Some(Vector(Some(id.toString))))))
  }

  private def trx(basePos: Long, id: Long): Seq[Operation] = Seq(
    Operation(OperationHeader(66693, OpType.Begin, 1546300800L, basePos)),
    insert(basePos + 50, id),
    Operation(OperationHeader(66693, OpType.Commit, 1546300800L, basePos + 100),
      progress = Some(Progress(Position("mysql-bin.000008", basePos + 100, 66693), None))))

  private def capture(f: => Unit): Vector[String] = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8"))(f)
    out.toString("UTF-8").linesIterator.toVector
  }

  test("prints decoded operations with seq/offset prefixes over Kafka frames") {
    val broker = new graft.kafka.KafkaBroker().start()
    try {
      val client = new graft.kafka.KafkaTopicClient("127.0.0.1", broker.port, "ops")
      try {
        val producer = new FragmentingProducer(producerId = 1L)
        (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
          .foreach(m => client.produce(Wire.encodeMessage(m)))
      } finally client.close()
      val lines = capture {
        TopicCat.main(Array(s"kafka://127.0.0.1:${broker.port}/ops"))
      }
      assert(lines.size == 6) // 2 trx x (begin, insert, commit)
      assert(lines.forall(_.matches("""\d+-\d+\t\d+-\d+\t\t\{.*\}""")))
      assert(lines.count(_.contains("\"type\":\"insert\"")) == 2)
      // count cap: only the first 2 ops print
      val capped = capture {
        TopicCat.main(Array(s"kafka://127.0.0.1:${broker.port}/ops", "0", "2"))
      }
      assert(capped.size == 2)
    } finally broker.close()
  }

  test("seq-dedup: a lastSeq watermark drops already-consumed trxs (TopicSim dialect)") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      val msgs1 = producer.produce(trx(200, 1))
      (msgs1 ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))
      val lines = capture {
        TopicCat.main(Array(s"127.0.0.1:${server.port}", "0", s"${Long.MaxValue}",
          msgs1.last.seq.toString))
      }
      // only trx2's ops survive the watermark
      assert(lines.size == 3)
      assert(lines.count(_.contains("\"type\":\"insert\"")) == 1)
    } finally server.close()
  }
}
