package graft.sources

import graft.cdc._
import org.scalatest.funsuite.AnyFunSuite

/** The consumer-library twin as a Spark streaming source: a downstream
  * pipeline `readStream.format("graft-topic")`s a served topic and gets
  * the decoded operation stream with the protocol's exactly-once contract
  * held across restarts (seq dedup from the checkpointed commit seq,
  * fragment groups completing across poll boundaries, batch boundaries
  * only on COMMITs). */
class TopicConsumeSourceSpec extends AnyFunSuite {

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

  private def readAll(stream: TopicConsumeMicroBatchStream,
      start: TopicOffset, end: TopicOffset): Vector[(Long, Long, Long, String)] = {
    val parts = stream.planInputPartitions(start, end)
    val reader = stream.createReaderFactory().createReader(parts(0))
    Iterator.continually(reader).takeWhile(_.next()).map { r =>
      val row = r.get()
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getUTF8String(3).toString)
    }.toVector
  }

  test("micro-batch consume over TopicSim: decode, slice, commit trims; " +
      "a later poll sees only new trxs") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))

      val stream = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      assert(stream.initialOffset() == TopicOffset.zero)
      val o1 = stream.latestOffset().asInstanceOf[TopicOffset]
      assert(o1.opIdx == 6) // 2 trx x (begin, insert, commit)
      val rows = readAll(stream, TopicOffset.zero, o1)
      assert(rows.map(_._1) == (0L until 6L).toVector)
      assert(rows.map(r => (r._4.contains("\"type\":\"begin\""),
        r._4.contains("\"type\":\"insert\""),
        r._4.contains("\"type\":\"commit\""))).count(_._2) == 2)
      // commit_seq is constant within a trx and increases across trxs
      assert(rows.slice(0, 3).map(_._2).distinct.size == 1)
      assert(rows.slice(3, 6).map(_._2).distinct.size == 1)
      assert(rows(3)._2 > rows(0)._2)

      stream.commit(o1)
      // new trx arrives; next batch is exactly its ops
      producer.produce(trx(600, 3)).foreach(m => client.produce(Wire.encodeMessage(m)))
      val o2 = stream.latestOffset().asInstanceOf[TopicOffset]
      assert(o2.opIdx == 9)
      val rows2 = readAll(stream, o1, o2)
      assert(rows2.map(_._1) == Vector(6L, 7L, 8L))
      assert(rows2.count(_._4.contains("\"type\":\"insert\"")) == 1)
      client.close()
      stream.stop()
    } finally server.close()
  }

  test("restart resume: a fresh stream armed at the checkpointed offset " +
      "seq-dedups the already-consumed prefix") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))

      // run 1 consumes everything and "checkpoints" o1
      val s1 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s1.initialOffset()
      val o1 = s1.latestOffset().asInstanceOf[TopicOffset]
      assert(o1.opIdx == 6)
      s1.stop()

      // run 2 re-arms from the checkpoint JSON (Spark's restart path) and
      // only sees the trx produced after the checkpoint — even though the
      // fetch replays the raw topic from the checkpointed msg offset, the
      // dup region is dropped by the seq floor
      producer.produce(trx(600, 3)).foreach(m => client.produce(Wire.encodeMessage(m)))
      val s2 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      val restored = s2.deserializeOffset(o1.json()).asInstanceOf[TopicOffset]
      assert(restored == o1)
      val o2 = s2.latestOffset().asInstanceOf[TopicOffset]
      assert(o2.opIdx == 9)
      val rows = readAll(s2, o1, o2)
      assert(rows.map(_._1) == Vector(6L, 7L, 8L))
      assert(rows.count(_._4.contains("\"type\":\"insert\"")) == 1)
      client.close()
      s2.stop()
    } finally server.close()
  }

  test("WAL replay hands offsets in either order: re-arm at the smaller " +
      "offset is allowed before the first poll, so the committed-but-" +
      "unprocessed batch is re-consumable") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))
      // simulate: run 1 checkpointed start=after-trx1, end=after-trx2
      val s0 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s0.initialOffset()
      s0.latestOffset()
      s0.stop()
      val start = TopicOffset(1, 1, 3) // after trx1 (1 raw msg, seq 1, 3 ops)

      val s = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      // WAL replay: END deserialized first, then START (smaller) — must re-arm
      val end = s.latestOffset().asInstanceOf[TopicOffset]
      assert(end.opIdx == 6)
      s.stop()
      val s2 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s2.deserializeOffset(end.json())
      s2.deserializeOffset(start.json()) // smaller, before first poll: re-arms
      val latest = s2.latestOffset().asInstanceOf[TopicOffset]
      assert(latest.opIdx == 6)
      val rows = readAll(s2, start, latest)
      assert(rows.map(_._1) == Vector(3L, 4L, 5L)) // trx2 re-consumed
      // after a poll, rewinding below the base is a hard error
      intercept[IllegalArgumentException] {
        s2.deserializeOffset(TopicOffset(0, 0, 0).json())
      }
      client.close()
      s2.stop()
    } finally server.close()
  }

  test("fragment group straddling a poll boundary completes on the next " +
      "poll; a torn group's ops are withheld until its final fragment") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      // tiny payload cap -> the trx fragments into multiple messages
      val producer = new FragmentingProducer(producerId = 1L, maxPayloadSize = 8)
      val msgs = producer.produce(trx(200, 1))
      assert(msgs.size > 1, "trx must fragment for this test")
      // publish all but the last fragment
      msgs.init.foreach(m => client.produce(Wire.encodeMessage(m)))
      val stream = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      stream.initialOffset()
      val o1 = stream.latestOffset().asInstanceOf[TopicOffset]
      // the tiny cap binary-splits the trx into one group per op; the two
      // complete groups (begin, insert) emit, the torn last group (commit)
      // is withheld in decoder state
      assert(o1.opIdx == 2, "incomplete fragment group must withhold its ops")
      // the REPORTED offset rewinds to the torn group's head — a restart
      // at o1 must refetch the whole group, not hit a seq gap on its tail
      val tornGroupHead = msgs.indexWhere(_.groupId == msgs.last.groupId)
      assert(o1.msgOffset == tornGroupHead,
        "checkpointed msg offset must be the torn group's head")
      // final fragment lands; the group completes with ALL its ops
      client.produce(Wire.encodeMessage(msgs.last))
      val o2 = stream.latestOffset().asInstanceOf[TopicOffset]
      assert(o2.opIdx == 3)
      val rows = readAll(stream, o1, o2)
      assert(rows.count(_._4.contains("\"type\":\"commit\"")) == 1)
      // the full stream carries the whole trx exactly once
      val all = readAll(stream, TopicOffset.zero, o2)
      assert(all.count(_._4.contains("\"type\":\"insert\"")) == 1)
      assert(all.map(_._1) == Vector(0L, 1L, 2L))
      client.close()
      stream.stop()
    } finally server.close()
  }

  test("restart replay of an UNCOMMITTED batch goes straight to " +
      "planInputPartitions (no latestOffset): the source refetches and " +
      "hands back the batch's original rows, not an empty partition") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))

      // run 1: batch [o1, o2) was written to the offset log, crash before
      // its commit-log entry
      val s1 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s1.initialOffset()
      s1.latestOffset() // [zero, all) consumed; say o1 = after trx1
      s1.stop()
      val o1 = TopicOffset(1, 1, 3)
      val o2 = TopicOffset(2, 2, 6)

      // restart: Spark deserializes both ends of the pending batch and
      // replays it DIRECTLY via planInputPartitions — latestOffset is
      // never called for a recovered batch (MicroBatchExecution skips
      // constructNextBatch)
      val s2 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s2.deserializeOffset(o2.json())
      s2.deserializeOffset(o1.json())
      val rows = readAll(s2, o1, o2)
      assert(rows.map(_._1) == Vector(3L, 4L, 5L),
        "replayed batch must carry its original rows")
      assert(rows.count(_._4.contains("\"type\":\"insert\"")) == 1)
      // and the stream continues correctly after the replayed batch
      s2.commit(o2)
      producer.produce(trx(600, 3)).foreach(m => client.produce(Wire.encodeMessage(m)))
      val o3 = s2.latestOffset().asInstanceOf[TopicOffset]
      assert(o3.opIdx == 9)
      assert(readAll(s2, o2, o3).map(_._1) == Vector(6L, 7L, 8L))
      client.close()
      s2.stop()
    } finally server.close()
  }

  test("retention purge: replaying a checkpointed batch against a broker " +
      "that no longer retains the range fails with an ACTIONABLE " +
      "retention diagnosis, not a bare coverage error") {
    // the broker was truncated/recreated: it holds NOTHING, while the
    // checkpoint references messages 1..2 (a purged range)
    val server = new TopicServer().start()
    try {
      val s2 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      val o1 = TopicOffset(1, 1, 3)
      val o2 = TopicOffset(2, 2, 6)
      s2.deserializeOffset(o2.json())
      s2.deserializeOffset(o1.json())
      val e = intercept[IllegalStateException](s2.planInputPartitions(o1, o2))
      assert(e.getMessage.contains("retention purged"),
        s"want a retention diagnosis, got: ${e.getMessage}")
      assert(e.getMessage.contains("unrecoverable"))
      s2.stop()
    } finally server.close()
  }

  test("restart AT a torn-group checkpoint: the fresh stream refetches the " +
      "whole group and completes it — no seq gap, no duplicate") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L, maxPayloadSize = 8)
      val msgs = producer.produce(trx(200, 1))
      msgs.init.foreach(m => client.produce(Wire.encodeMessage(m)))
      val s1 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s1.initialOffset()
      val o1 = s1.latestOffset().asInstanceOf[TopicOffset]
      assert(o1.opIdx == 2) // begin+insert groups; commit group torn
      s1.stop()

      // the query restarts from the checkpoint; the final fragment lands
      client.produce(Wire.encodeMessage(msgs.last))
      val s2 = new TopicConsumeMicroBatchStream(s"127.0.0.1:${server.port}")
      s2.deserializeOffset(o1.json())
      val o2 = s2.latestOffset().asInstanceOf[TopicOffset]
      assert(o2.opIdx == 3)
      val rows = readAll(s2, o1, o2)
      assert(rows.map(_._1) == Vector(2L))
      assert(rows.head._4.contains("\"type\":\"commit\""))
      client.close()
      s2.stop()
    } finally server.close()
  }

  test("admission control: maxOpsPerTrigger caps batches at group " +
      "boundaries; every batch end is a replayable checkpoint") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)) ++
        producer.produce(trx(600, 3)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))

      val stream = new TopicConsumeMicroBatchStream(
        s"127.0.0.1:${server.port}", maxOpsPerTrigger = Some(4L))
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      assert(stream.getDefaultReadLimit.toString.contains("4"))
      val z = stream.initialOffset().asInstanceOf[TopicOffset]
      // budget 4 ops -> only trx1's 3-op group fits
      val o1 = stream.latestOffset(z, ReadLimit.maxRows(4)).asInstanceOf[TopicOffset]
      assert(o1.opIdx == 3)
      assert(readAll(stream, z, o1).map(_._1) == Vector(0L, 1L, 2L))
      // budget 1 op -> smaller than any group: one whole group still taken
      val o2 = stream.latestOffset(o1, ReadLimit.maxRows(1)).asInstanceOf[TopicOffset]
      assert(o2.opIdx == 6, "progress quantum is one whole group")
      // allAvailable from there drains the rest
      val o3 = stream.latestOffset(o2, ReadLimit.allAvailable()).asInstanceOf[TopicOffset]
      assert(o3.opIdx == 9)
      client.close()
      stream.stop()
    } finally server.close()
  }

  test("bounded polling: with admission control the driver buffers ∝ the " +
      "trigger budget, not the whole retained backlog") {
    val server = new TopicServer().start()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      // a long-retained backlog: 40 trxs = 120 ops / ≥120 messages
      (1 to 40).flatMap(i => producer.produce(trx(i * 200L, i.toLong)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))

      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      val stream = new TopicConsumeMicroBatchStream(
        s"127.0.0.1:${server.port}", maxOpsPerTrigger = Some(6L), pollPage = 4)
      val z = stream.initialOffset().asInstanceOf[TopicOffset]
      val o1 = stream.latestOffset(z, ReadLimit.maxRows(6)).asInstanceOf[TopicOffset]
      assert(o1.opIdx == 6)
      assert(stream.bufferedOps < 30,
        s"poll must stop near the budget, buffered ${stream.bufferedOps} of 120")
      assert(readAll(stream, z, o1).map(_._1) == (0L until 6L).toVector)
      // later triggers keep draining correctly page by page
      stream.commit(o1)
      val o2 = stream.latestOffset(o1, ReadLimit.maxRows(6)).asInstanceOf[TopicOffset]
      assert(o2.opIdx == 12)
      assert(readAll(stream, o1, o2).map(_._1) == (6L until 12L).toVector)
      client.close()
      stream.stop()
    } finally server.close()
  }

  test("spark.read (BATCH) format graft-topic: the recovery scan as a " +
      "DataFrame, decoded on an executor; fromSeq resumes past a prefix") {
    val server = new TopicServer().start()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-topic-batch-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val client = new TopicClient("127.0.0.1", server.port)
      val producer = new FragmentingProducer(producerId = 1L)
      val msgs1 = producer.produce(trx(200, 1))
      (msgs1 ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))
      client.close()

      val df = spark.read.format("graft-topic")
        .option("addr", s"127.0.0.1:${server.port}").load()
      val rows = df.orderBy("op_idx").collect()
      assert(rows.length == 6)
      assert(rows.map(_.getLong(0)).toVector == (0L until 6L).toVector)
      assert(rows.count(_.getString(3).contains("\"type\":\"insert\"")) == 2)
      // and it behaves as a real table: aggregates distribute
      assert(df.groupBy("commit_seq").count().count() == 2)

      // fromSeq: the lastSeq watermark semantics of the recovery scan
      val tail = spark.read.format("graft-topic")
        .option("addr", s"127.0.0.1:${server.port}")
        .option("fromSeq", msgs1.last.seq.toString)
        .load().collect()
      assert(tail.length == 3)
      assert(tail.count(_.getString(3).contains("\"type\":\"insert\"")) == 1)
    } finally { spark.stop(); server.close() }
  }

  test("spark.readStream format graft-topic end-to-end over the kafka wire " +
      "dialect") {
    val broker = new graft.kafka.KafkaBroker().start()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-topic-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val client = new graft.kafka.KafkaTopicClient("127.0.0.1", broker.port, "ops")
      val producer = new FragmentingProducer(producerId = 1L)
      (producer.produce(trx(200, 1)) ++ producer.produce(trx(400, 2)))
        .foreach(m => client.produce(Wire.encodeMessage(m)))
      client.close()

      val q = spark.readStream.format("graft-topic")
        .option("addr", s"kafka://127.0.0.1:${broker.port}/ops")
        .load()
        .writeStream.format("memory").queryName("topicmem").outputMode("append")
        .start()
      try {
        val deadline = System.nanoTime() + 30_000_000_000L
        def rows() = spark.sql(
          "SELECT op_idx, op_json FROM topicmem ORDER BY op_idx").collect()
        while (rows().length < 6 && System.nanoTime() < deadline) Thread.sleep(100)
        val got = rows()
        assert(got.length == 6)
        assert(got.map(_.getLong(0)).toVector == (0L until 6L).toVector)
        assert(got.count(_.getString(1).contains("\"type\":\"insert\"")) == 2)
      } finally q.stop()
    } finally { spark.stop(); broker.close() }
  }

  /** Scripted broker for dialect edge cases the simulator can't produce:
    * a SPARSE log (real Kafka skips offsets for compaction holes and
    * transaction control records) and a producer that appends during the
    * consumer's poll. */
  private final class ScriptedTopic(logStart: Long = 0L,
      onFetch: ScriptedTopic => Unit = _ => ()) extends TopicLike {
    @volatile var log: Vector[(Long, Array[Byte])] = Vector.empty
    var fetches = 0
    def appendAt(off: Long, bytes: Array[Byte]): Unit =
      synchronized { log = log :+ ((off, bytes)) }
    override def highWaterMark(): Long =
      synchronized(log.lastOption.map(_._1 + 1).getOrElse(logStart))
    override def logStartOffset(): Long = logStart
    override def produce(msg: Array[Byte]): Long = synchronized {
      appendAt(highWaterMark(), msg); highWaterMark()
    }
    override def fetchFrom(fromOffset: Long): Vector[(Long, Array[Byte])] =
      synchronized(log.filter(_._1 >= fromOffset))
    override def fetchPage(fromOffset: Long,
        maxMessages: Int): Vector[(Long, Array[Byte])] = {
      onFetch(this)
      synchronized { fetches += 1; log.filter(_._1 >= fromOffset).take(maxMessages) }
    }
  }

  test("benign offset gaps (compaction / txn control records) do NOT " +
      "trigger the retention-purge diagnosis while the log start is " +
      "below the checkpoint") {
    val topic = new ScriptedTopic()
    val producer = new FragmentingProducer(producerId = 1L)
    // trx1 at dense offsets 0..2; a control record consumed offset 3; trx2
    // lands at 4..6 — a healthy real-Kafka log shape
    producer.produce(trx(200, 1)).zipWithIndex.foreach { case (m, i) =>
      topic.appendAt(i.toLong, Wire.encodeMessage(m)) }
    producer.produce(trx(400, 2)).zipWithIndex.foreach { case (m, i) =>
      topic.appendAt(4L + i, Wire.encodeMessage(m)) }
    TopicLike.registerDialect("scripted-gap://", _ => topic)

    val stream = new TopicConsumeMicroBatchStream("scripted-gap://t")
    val z = stream.initialOffset().asInstanceOf[TopicOffset]
    val o1 = stream.latestOffset().asInstanceOf[TopicOffset]
    assert(o1.opIdx == 6, "both trxs must decode across the offset gap")
    val rows = readAll(stream, z, o1)
    assert(rows.count(_._4.contains("\"type\":\"insert\"")) == 2)
    stream.stop()
  }

  test("a producer outrunning the poll cannot wedge latestOffset: the " +
      "drain is bounded by the hwm observed at poll entry") {
    val producer = new FragmentingProducer(producerId = 1L)
    var next = 10
    // every fetch round lands another whole trx — fetchPage NEVER comes
    // back empty, so an unbounded drain would chase the tail forever
    val topic: ScriptedTopic = new ScriptedTopic(onFetch = t => {
      next += 1
      producer.produce(trx(next * 200L, next.toLong))
        .foreach(m => t.produce(Wire.encodeMessage(m)))
    })
    producer.produce(trx(200, 1)).foreach(m => topic.produce(Wire.encodeMessage(m)))
    producer.produce(trx(400, 2)).foreach(m => topic.produce(Wire.encodeMessage(m)))
    TopicLike.registerDialect("scripted-race://", _ => topic)

    val stream = new TopicConsumeMicroBatchStream("scripted-race://t", pollPage = 4)
    stream.initialOffset()
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var o1: TopicOffset = null
    val t = new Thread(() => {
      o1 = stream.latestOffset().asInstanceOf[TopicOffset]; done.countDown()
    })
    t.setDaemon(true)
    t.start()
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "latestOffset must return against a continuously producing topic")
    assert(o1.opIdx >= 6, "the two pre-poll trxs are fully drained")
    assert(topic.fetches <= 8,
      s"the drain must stop at the entry hwm, took ${topic.fetches} fetch rounds")
    stream.stop()
  }

  test("BATCH scan drains a topic larger than the page size in bounded " +
      "fetchPage rounds — never one unbounded fetchFrom(0)") {
    val producer = new FragmentingProducer(producerId = 1L)
    // 12 trxs -> 36 raw messages: many pages at pageSize=4
    val topic = new TopicLike {
      @volatile var log: Vector[(Long, Array[Byte])] = Vector.empty
      var fetches = 0
      var maxPage = 0
      override def highWaterMark(): Long = log.size.toLong
      override def produce(msg: Array[Byte]): Long =
        synchronized { log = log :+ ((log.size.toLong, msg)); log.size.toLong }
      override def fetchFrom(fromOffset: Long): Vector[(Long, Array[Byte])] =
        fail("batch scan must page, not fetchFrom the whole topic")
      override def fetchPage(fromOffset: Long,
          maxMessages: Int): Vector[(Long, Array[Byte])] = synchronized {
        fetches += 1
        val page = log.filter(_._1 >= fromOffset).take(maxMessages)
        maxPage = math.max(maxPage, page.size)
        page
      }
    }
    (1 to 12).foreach(i =>
      producer.produce(trx(i * 200L, i.toLong))
        .foreach(m => topic.produce(Wire.encodeMessage(m))))
    val nMsgs = topic.log.size
    assert(nMsgs > 8, s"test setup: need multiple pages, got $nMsgs messages")
    TopicLike.registerDialect("scripted-batchpage://", _ => topic)

    val reader = new TopicBatchReaderFactory()
      .createReader(TopicBatchScan("scripted-batchpage://t", 0L, pageSize = 4))
    val rows = Iterator.continually(reader).takeWhile(_.next()).map { r =>
      (r.get().getLong(0), r.get().getUTF8String(3).toString)
    }.toVector
    reader.close()
    assert(rows.length == 36, s"12 trx x 3 ops, got ${rows.length}")
    assert(rows.map(_._1) == (0L until 36L).toVector)
    assert(rows.count(_._2.contains("\"type\":\"insert\"")) == 12)
    assert(topic.maxPage <= 4, s"a fetch round exceeded the page bound: ${topic.maxPage}")
    val expected = (nMsgs + 3) / 4
    assert(topic.fetches >= expected && topic.fetches <= expected + 2,
      s"expected ~$expected bounded rounds for $nMsgs messages, took ${topic.fetches}")
  }
}
