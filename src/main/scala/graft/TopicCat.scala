package graft

import graft.cdc._

/** Twin of the reference's `kafka-consumer` tool
  * (/root/reference/cmd/tools/kafka-consumer/main.go): consume a topic
  * from an offset, decode through the seq-dedup OperationDecoder
  * (fragments reassembled, replays dropped), and print one line per
  * operation — `beginSeq-endSeq  beginOffset-endOffset  <json>` — so an
  * operator can eyeball exactly what the sink wrote, including across the
  * seam of a producer restart.
  *
  * Usage: TopicCat <addr> [fromOffset=0] [count=all] [lastSeq=0]
  * where <addr> is `kafka://host:port/topic` (the real wire protocol) or
  * `host:port` (the TopicSim dialect). `lastSeq` seeds the dedup exactly
  * like the recovery scan (-s in the reference tool).
  */
object TopicCat {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TopicCat <kafka://host:port/topic | host:port> " +
        "[fromOffset] [count] [lastSeq]")
      sys.exit(2)
    }
    val addr = args(0)
    val from = args.lift(1).map(_.toLong).getOrElse(0L)
    val count = args.lift(2).map(_.toLong).getOrElse(Long.MaxValue)
    val lastSeq = args.lift(3).map(_.toLong).getOrElse(0L)

    val client: TopicLike =
      if (addr.startsWith("kafka://")) {
        val rest = addr.stripPrefix("kafka://")
        val slash = rest.indexOf('/')
        require(slash > 0 && slash < rest.length - 1,
          s"kafka:// address needs an explicit /topic, got '$addr'")
        val hp = rest.substring(0, slash)
        val colon = hp.lastIndexOf(':')
        new graft.kafka.KafkaTopicClient(hp.substring(0, colon),
          hp.substring(colon + 1).toInt, rest.substring(slash + 1))
      } else {
        val colon = addr.lastIndexOf(':')
        new TopicClient(addr.substring(0, colon), addr.substring(colon + 1).toInt)
      }

    val dec = new OperationDecoder(Wire, lastCommitSeq = lastSeq)
    var printed = 0L
    val it = client.fetchFrom(from).iterator
    while (it.hasNext && printed < count) {
      val (off, data) = it.next()
      dec.feed(data, off).foreach { batch =>
        batch.ops.foreach { op =>
          if (printed < count) {
            println(s"${batch.beginSeq}-${batch.commitSeq}\t" +
              s"${batch.beginOffset}-${batch.commitOffset}\t\t" +
              graft.streaming.OperationJson.render(op))
            printed += 1
          }
        }
      }
    }
    client match {
      case c: graft.kafka.KafkaTopicClient => c.close()
      case _ => ()
    }
  }
}
