package graft

import graft.cdc._
import graft.streaming.{OperationJson, Replay}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CDC replay throughput benchmark — the single-node-throughput claim
  * against the reference (BASELINE.md publishes no numbers, so the honest
  * comparison is ops/sec through the equivalent pipeline stages).
  *
  * Generates N operations (BEGIN + 3 INSERTs + COMMIT transactions with
  * monotonically increasing positions, row shapes from the recorded
  * fixture), then measures:
  *  - `pipeline_ops_per_sec`: the full ordered Replay path — streaming
  *    source → JSON decode → filters → restart dedup → trx batching → wire
  *    encode (seq/fragment/zlib) → JSON + wire sinks + checkpoints. Ordered
  *    delivery pins the sink to one consumer, like the reference's
  *    single-threaded loop (W1).
  *  - `encode_ops_per_sec`: the pure encode stage (trx batching + wire
  *    protocol) on one thread — the reference's produce-loop analogue.
  *
  * Usage: CdcBench [nOps] (default 600k — the segment-file sink is sized
  * for sustained throughput: parallel render + spill amortizes its fixed
  * costs (micro-batch setup, fixture parse, task scheduling ≈ 4-5s) over
  * the stream, so small-n runs measure setup, not the pipeline. Measured:
  * 50.9k ops/s at 600k vs the 14.4k of the old collect-render sink; at
  * 60k the fixed costs dominate either design).
  */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600000)
    val tmp = Files.createTempDirectory("cdcbench")
    val fixture = tmp.resolve("stream.jsonl")

    // synthesize n ops from the fixture's table shape
    val cols = Vector(
      ColumnDef("id", "int(11)", InnerType.LONG),
      ColumnDef("content", "blob", InnerType.BLOB),
      ColumnDef("name", "varchar(100)", InnerType.VARCHAR))
    val tdef = TableDef("test", "canal_test", cols, "utf8")
    def header(tpe: String, pos: Long) = OperationHeader(66693L, tpe, 1589442258L, pos)
    val sb = new StringBuilder
    var pos = 4L
    var written = 0
    var trx = 0
    while (written < n) {
      val ops = Vector(
        Operation(header(OpType.Begin, pos + 1)),
        Operation(header(OpType.Insert, pos + 2), table = Some(tdef), rows = Vector(
          OpRow(None, Some(Vector(Some(s"${trx * 3 + 1}"), Some("payload-" + trx), Some("a")))))),
        Operation(header(OpType.Insert, pos + 3), table = Some(tdef), rows = Vector(
          OpRow(None, Some(Vector(Some(s"${trx * 3 + 2}"), None, Some("b")))))),
        Operation(header(OpType.Insert, pos + 4), table = Some(tdef), rows = Vector(
          OpRow(None, Some(Vector(Some(s"${trx * 3 + 3}"), Some("x\ny"), Some("c")))))),
        Operation(header(OpType.Commit, pos + 5),
          progress = Some(Progress("mysql-bin.000008", pos + 5, 66693L))))
      ops.foreach { op => sb.append(OperationJson.render(op)).append('\n') }
      written += ops.size
      trx += 1
      pos += 5
    }
    Files.writeString(fixture, sb.toString)

    // stage throughput: trx batching + wire encode on one thread
    val ops = Files.readAllLines(fixture).asScala.map(OperationJson.parse).toVector
    val batcher = new TrxBatcher()
    val producer = new FragmentingProducer(producerId = 1L, maxPayloadSize = 1 << 20)
    val t0 = System.nanoTime()
    var messages = 0L
    ops.foreach { op =>
      batcher.offer(op).toVector.flatten match {
        case Vector() => ()
        case batch => messages += producer.produce(batch).size
      }
    }
    val encSec = (System.nanoTime() - t0) / 1e9

    // full pipeline throughput (ordered sinks, checkpoints, restart dedup)
    // over each sink dialect: file (no broker), the TopicSim wire, and the
    // real Kafka protocol in both record formats — every produce in the
    // ordered drain is a synchronous acks=-1 round-trip, the reference's
    // WaitForAll produce loop
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pipelineRun(label: String, topicAddr: Option[String]): (Long, Long) = {
      val t = System.nanoTime()
      val stats = Replay.run(spark, fixture, tmp.resolve(s"out-$label"),
        topicAddr = topicAddr)
      val sec = (System.nanoTime() - t) / 1e9
      ((stats.emitted / sec).toLong, stats.wireMessages)
    }
    // untimed warmup: the first streaming run pays JIT + codegen +
    // micro-batch-machinery init for the whole JVM; without this the
    // first measured leg absorbs it all and the dialect ordering lies
    pipelineRun("warmup", None)

    // interleaved median-of-3 per dialect (the ClusterBench method): the
    // box's run-to-run variance exceeds the dialect deltas, so a single
    // pass per dialect can invert the ordering — pass p runs every
    // dialect back-to-back, and each dialect reports its median across
    // passes. Brokered passes get a FRESH topic (new sim server /
    // bench-p topic name): producing the same seqs into a reused topic
    // would make the next pass's recovery adopt them and seq-dedup-drop
    // the whole stream.
    val broker = new graft.kafka.KafkaBroker().start()
    val passes = 3
    val file, simA, kafkaA, kafka2A = Array.ofDim[Long](passes)
    var sim: TopicServer = null
    var kafkaMsgs = 0L; var simMsgs = 0L
    for (p <- 0 until passes) {
      file(p) = pipelineRun(s"file-$p", None)._1
      if (sim != null) sim.close()
      sim = new TopicServer().start()
      val (sRate, sMsgs) = pipelineRun(s"sim-$p", Some(s"127.0.0.1:${sim.port}"))
      simA(p) = sRate; simMsgs = sMsgs
      val (kRate, kMsgs) =
        pipelineRun(s"kafka-$p", Some(s"kafka://127.0.0.1:${broker.port}/bench-$p"))
      kafkaA(p) = kRate; kafkaMsgs = kMsgs
      kafka2A(p) = pipelineRun(s"kafka2-$p",
        Some(s"kafka2://127.0.0.1:${broker.port}/bench2-$p"))._1
    }
    def median(a: Array[Long]): Long = a.sorted.apply(a.length / 2)
    val filePipe = median(file)
    val simPipe = median(simA)
    val kafkaPipe = median(kafkaA)
    val kafka2Pipe = median(kafka2A)

    // recovery-scan throughput: a zeroed checkpoint forces a full topic
    // scan (ListOffsets + paged Fetch + CRC verify + seq-dedup decode) —
    // the restart-repair path, measured over both wire dialects
    // scans are read-only over the LAST pass's topics, so median-of-3 on
    // one client is sound
    def scanRate(client: TopicLike): Long = {
      def once(): Long = {
        val t = System.nanoTime()
        val rec = KafkaRecovery.recover(client, Checkpoint(Progress.zero)
          .withIntCtx("acked_seq", 0L).withIntCtx("acked_offset", -1L))
        val sec = (System.nanoTime() - t) / 1e9
        (rec.scanned / sec).toLong
      }
      try median(Array.fill(3)(once())) finally client.close()
    }
    val simScan = scanRate(new TopicClient("127.0.0.1", sim.port))
    val kafkaScan = scanRate(
      new graft.kafka.KafkaTopicClient("127.0.0.1", broker.port, s"bench-${passes - 1}"))
    val kafka2Scan = scanRate(new graft.kafka.KafkaTopicClient("127.0.0.1", broker.port,
      s"bench2-${passes - 1}", messageFormat = 2))

    // graft-topic source throughput: the downstream-consumer path (poll +
    // seq-dedup decode + JSON render + InternalRow build) through the DSv2
    // micro-batch machinery over the last pass's topic — read-only, so
    // median-of-3 with a fresh stream per pass is sound
    def consumeRate(addr: String): Long = {
      def once(): Long = {
        val s = new graft.sources.TopicConsumeMicroBatchStream(addr)
        val t = System.nanoTime()
        s.initialOffset()
        val end = s.latestOffset().asInstanceOf[graft.sources.TopicOffset]
        val parts = s.planInputPartitions(graft.sources.TopicOffset.zero, end)
        val reader = s.createReaderFactory().createReader(parts(0))
        var c = 0L
        while (reader.next()) c += 1
        val sec = (System.nanoTime() - t) / 1e9
        s.stop()
        require(c == end.opIdx, s"consume read $c of ${end.opIdx} ops")
        (c / sec).toLong
      }
      median(Array.fill(3)(once()))
    }
    val simConsume = consumeRate(s"127.0.0.1:${sim.port}")
    val kafkaConsume = consumeRate(s"kafka://127.0.0.1:${broker.port}/bench-${passes - 1}")
    sim.close(); broker.close()
    spark.stop()

    def arr(a: Array[Long]): String = a.mkString("[", ",", "]")
    // machine-derived trend clause (r15 "What's wrong" 4) — computed against
    // the previous round's committed BENCH_cdc.json before the evidence
    // script overwrites it with this line
    val vsPrev = BenchPrev.note("BENCH_cdc.json", Seq(
      "encode_ops_per_sec" -> n / encSec,
      "pipeline_ops_per_sec" -> filePipe.toDouble,
      "pipeline_topicsim_ops_per_sec" -> simPipe.toDouble,
      "pipeline_kafka_ops_per_sec" -> kafkaPipe.toDouble,
      "pipeline_kafka2_ops_per_sec" -> kafka2Pipe.toDouble))
    println(s"""{"metric":"cdc_throughput","n_ops":$n,""" +
      s""""vs_prev":"$vsPrev",""" +
      s""""encode_ops_per_sec":${(n / encSec).toLong},""" +
      s""""pipeline_ops_per_sec":$filePipe,""" +
      s""""pipeline_topicsim_ops_per_sec":$simPipe,""" +
      s""""pipeline_kafka_ops_per_sec":$kafkaPipe,""" +
      s""""pipeline_kafka2_ops_per_sec":$kafka2Pipe,""" +
      s""""pipeline_passes":{"file":${arr(file)},"topicsim":${arr(simA)},""" +
      s""""kafka":${arr(kafkaA)},"kafka2":${arr(kafka2A)}},""" +
      s""""recovery_scan_topicsim_msgs_per_sec":$simScan,""" +
      s""""recovery_scan_kafka_msgs_per_sec":$kafkaScan,""" +
      s""""recovery_scan_kafka2_msgs_per_sec":$kafka2Scan,""" +
      s""""consume_source_topicsim_ops_per_sec":$simConsume,""" +
      s""""consume_source_kafka_ops_per_sec":$kafkaConsume,""" +
      s""""wire_messages":$messages,"topic_messages":$kafkaMsgs,""" +
      s""""sim_messages":$simMsgs}""")
  }
}
