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
  * where <addr> is `kafka://host:port/topic` (the real wire protocol),
  * `kafka2://host:port/topic` (the magic-2 RecordBatch dialect), or
  * `host:port` (the TopicSim dialect). `lastSeq` seeds the dedup exactly
  * like the recovery scan (-s in the reference tool).
  */
object TopicCat {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TopicCat <kafka://host:port/topic | kafka2://host:port/topic | host:port> " +
        "[fromOffset] [count] [lastSeq]")
      sys.exit(2)
    }
    val addr = args(0)
    val from = args.lift(1).map(_.toLong).getOrElse(0L)
    val count = args.lift(2).map(_.toLong).getOrElse(Long.MaxValue)
    val lastSeq = args.lift(3).map(_.toLong).getOrElse(0L)

    val client = TopicLike.connect(addr)
    try {
      // STREAM the topic in bounded pages (a real topic can be huge — the
      // reference tool consumes message-by-message; materializing everything
      // to print ten lines would be wrong)
      val dec = new OperationDecoder(Wire, lastCommitSeq = lastSeq)
      var printed = 0L
      var off = from
      var done = false
      while (!done && printed < count) {
        val page = client.fetchPage(off, 256)
        if (page.isEmpty) done = true
        else {
          page.foreach { case (msgOff, data) =>
            dec.feed(data, msgOff).foreach { batch =>
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
          off = page.last._1 + 1
        }
      }
    } finally client.close()
  }
}
