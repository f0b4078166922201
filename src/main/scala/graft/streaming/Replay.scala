package graft.streaming

import graft.cdc._
import graft.streaming.ChangeStream._
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64
import scala.jdk.CollectionConverters._

/** End-to-end binlog replay (SURVEY.md §7 step 3): recorded binlog-event
  * JSON fixtures → Structured Streaming → two sinks:
  *
  *  - a stdout-twin JSON-lines sink (K2, /root/reference/sink/stdout/) with
  *    progress checkpointed only at transaction boundaries (T1 —
  *    /root/reference/canal/sync.go:86-91) through the dual-file CkpManager;
  *  - a Kafka-twin wire sink (K1): trx batching → fragmentation → seq
  *    protocol, written as base64 lines (one per would-be Kafka message).
  *
  * Restart honors F3: events at-or-below the persisted checkpoint are
  * dropped, so re-feeding the stream from the beginning emits no duplicates.
  *
  * Usage: Replay <fixture.jsonl> <outDir>  (run twice to observe dedup)
  */
object Replay {

  def main(args: Array[String]): Unit = {
    val Array(fixture, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-replay")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val stats = run(spark, Paths.get(fixture), Paths.get(outDir))
      // one-line machine-readable outcome (driver/smoke-friendly)
      println(s"""{"emitted":${stats.emitted},"droppedAsDuplicate":${stats.dropped},""" +
        s""""wireMessages":${stats.wireMessages},"checkpoint":"${stats.checkpoint}"}""")
    } finally spark.stop()
  }

  final case class ReplayStats(emitted: Long, dropped: Long, wireMessages: Long, checkpoint: String)

  def run(spark: SparkSession, fixture: Path, outDir: Path,
      includes: Seq[String] = Nil, excludes: Seq[String] = Nil): ReplayStats = {
    Files.createDirectories(outDir)
    val ckpMgr = new CkpManager(new FileCkpStorage(outDir.resolve("ckp")))
    // per-sink checkpoints (K4 mux: each sink dedups against its OWN
    // progress, F3) — the stream-level filter below uses their MINIMUM
    // (A2), the reference's resume position across sinks
    val stdoutCkp = ckpMgr.get("stdout").map(_.progress).getOrElse(Progress.zero)
    val wireCkp = ckpMgr.get("wire").map(_.progress).getOrElse(Progress.zero)
    val startCkp =
      if (stdoutCkp.isZero || wireCkp.isZero) Progress.zero
      else if (stdoutCkp.pos.tryCompare(wireCkp.pos).exists(_ <= 0)) stdoutCkp
      else if (stdoutCkp.pos.tryCompare(wireCkp.pos).isDefined) wireCkp
      else Progress.zero // cross-server_id: incomparable → replay from zero

    // source: the DSv2 binlog-replay stream (graft.sources) — offsets are
    // binlog positions, rotate/log-name threading happens in the source
    val totalInput =
      Files.readAllLines(fixture).asScala.count(_.trim.nonEmpty).toLong

    import spark.implicits._
    val ds = spark.readStream.format("binlog-replay")
      .option("path", fixture.toString).load()
      .select("seq_no", "log_name", "op_json").as[(Long, String, String)]
      .map { case (seqNo, logName, json) =>
        OpEnvelope(seqNo, logName, OperationJson.parse(json))
      }

    val filtered = dedupBelowCheckpoint(
      globalFilter(ds, includes, excludes), startCkp)

    val jsonOut = outDir.resolve("operations.jsonl")
    val wireOut = outDir.resolve("wire.b64l")
    var emitted = 0L
    var wireMessages = 0L
    val producer = new FragmentingProducer(producerId = 1L, maxPayloadSize = 1 << 20)
    val batcher = new TrxBatcher()

    // F3 as a per-sink predicate (same rule as dedupBelowCheckpoint),
    // applied inside the mux so each sink honors its own checkpoint
    def aboveCkp(e: OpEnvelope, ckp: Progress): Boolean =
      ckp.isZero || {
        val pos = Position(e.logName, e.op.header.logPos, e.op.header.serverId)
        pos.serverId != ckp.pos.serverId || pos.compare(ckp.pos) > 0
      }
    def lastProgress(ops: Array[OpEnvelope]): Option[Progress] =
      ops.reverseIterator.flatMap(_.op.progress).nextOption()

    val query = filtered.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[OpEnvelope], _: Long) =>
        // per-sink ordered consumption (the sink's single run-loop analogue,
        // W1). Rendering in executors and collecting (json, envelope) pairs
        // was MEASURED SLOWER (14k vs 19k ops/s) than this driver-side
        // render — the doubled collect payload costs more than the render.
        val ordered = batch.collect().sortBy(_.seqNo)

        // sink 1 (K2 twin): JSON lines
        val forJson = ordered.filter(aboveCkp(_, stdoutCkp))
        Files.write(jsonOut, forJson.map(e => OperationJson.render(e.op)).toSeq.asJava,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        emitted += forJson.length

        // sink 2 (K1 twin): trx batching → wire messages
        val forWire = ordered.filter(aboveCkp(_, wireCkp))
        val wireLines = forWire.toVector.flatMap { e =>
          batcher.offer(e.op).toVector.flatten match {
            case Vector() => Vector.empty
            case trx => producer.produce(trx)
              .map(m => Base64.getEncoder.encodeToString(Wire.encodeMessage(m)))
          }
        }
        Files.write(wireOut, wireLines.asJava,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        wireMessages += wireLines.size

        // T1: progress advances only at transaction boundaries, per sink
        lastProgress(forJson).foreach(p => ckpMgr.update("stdout", Checkpoint(p)))
        lastProgress(forWire).foreach(p => ckpMgr.update("wire", Checkpoint(p)))
        if (lastProgress(forJson).isDefined || lastProgress(forWire).isDefined)
          ckpMgr.persist()
      }
      .start()
    query.processAllAvailable()
    query.stop()

    val finalCkp = ckpMgr.get("stdout").map(_.progress).getOrElse(Progress.zero)
    ReplayStats(emitted, totalInput - emitted, wireMessages, finalCkp.toString)
  }
}
