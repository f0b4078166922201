package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Seeded randomized fuzzing of d20 (span dedup) and e23 (count-min
  * sketch) against plain-Scala reference implementations — tiny alphabets
  * force heavy gram collisions, lengths straddle the K-gram minimum, user
  * multisets force real CMS bucket collisions. Deterministic seeds: a
  * failure is a reproducible counterexample (the PlansRandomizedSpec
  * pattern applied to the round-8 operators). */
class SpanSketchRandomizedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("span-sketch-randomized-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- d20 reference: the span semantics in 20 lines of plain Scala ----
  private def tokenize(text: String): Vector[String] =
    "[a-z0-9']+".r.findAllIn(text.toLowerCase).toVector

  private def refSpans(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val K = 4
    val toks = docs.map { case (id, t) => id -> tokenize(t) }
    val grams = toks.flatMap { case (id, ts) =>
      if (ts.size < K) Seq.empty
      else ts.sliding(K).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }.toSeq
    }
    val dup = grams.groupBy(_._3).collect { case (g, occ) if occ.size >= 2 => g }.toSet
    toks.map { case (id, ts) =>
      val cov = grams.collect { case (d, p, g) if d == id && dup(g) =>
        p until p + K }.flatten.toSet
      val sorted = cov.toSeq.sorted
      val spans = sorted.zipWithIndex.count { case (p, i) =>
        i == 0 || sorted(i - 1) != p - 1 }
      id -> ((ts.size.toLong, cov.size.toLong, spans.toLong))
    }.toMap
  }

  test("d20 equals the Scala reference on random corpora (collision-heavy)") {
    import spark.implicits._
    for ((seed, nDocs, vocab, maxLen) <- Seq(
        (21L, 40, 4, 25),  // tiny vocab: heavy duplication
        (22L, 60, 8, 12),  // short docs, many below the K=4 minimum
        (23L, 25, 3, 40),  // long docs over 3 words: near-total coverage
        (24L, 30, 30, 20))) { // wide vocab: sparse duplication
      val rnd = new scala.util.Random(seed)
      val docs = (0 until nDocs).map { i =>
        val len = rnd.nextInt(maxLen + 1)
        (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
      }
      val dir = Files.createTempDirectory(s"d20fuzz$seed").toString
      docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("d20_dup_span_removal")(spark, dir)
        .select("doc_id", "n_tokens", "dup_tokens", "n_spans")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == refSpans(docs), s"seed=$seed")
    }
  }

  test("e23 equals the Scala reference CMS on random user multisets") {
    import spark.implicits._
    def bucket(j: Int, u: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$j-$u").take(6), 16) % 64L
    for ((seed, nEvents, users) <- Seq(
        (31L, 800, 120), (32L, 500, 300), (33L, 1000, 20))) {
      val rnd = new scala.util.Random(seed)
      val events = (0 until nEvents).map { i =>
        (i.toLong, new Timestamp(1700000000000L + i * 1000L),
          rnd.nextInt(users).toLong, "click", 1.0, "{}")
      }
      val dir = Files.createTempDirectory(s"e23fuzz$seed").toString
      events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")

      val perUser = events.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val cells = (for { (u, n) <- perUser.toSeq; j <- 0 until 4 }
        yield ((j, bucket(j, u)), n))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val expect = perUser.toSeq
        .map { case (u, n) =>
          (u, n, (0 until 4).map(j => cells((j, bucket(j, u)))).min) }
        .sortBy { case (u, n, _) => (-n, u) }.take(20).zipWithIndex
        .map { case ((u, n, est), i) => (u, n, est, i + 1) }

      val got = graft.SparkEntry.queries("e23_cmsketch_heavy_hitters")(spark, dir)
        .as[(Long, Long, Long, Int)].collect().toSeq
      assert(got == expect, s"seed=$seed")
      assert(got.forall { case (_, n, est, _) => est >= n }, s"seed=$seed: underestimate")
    }
  }
}
