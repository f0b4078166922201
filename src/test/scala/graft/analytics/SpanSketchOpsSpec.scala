package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Targeted gates for d20 (duplicated-substring spans), e23 (count-min
  * heavy hitters) and e24 (CEP pattern matching) — the algorithmic
  * properties the DuckDB hash-compare can't isolate: d20's interval-union
  * semantics (overlap merge, touching spans, within-doc repeats) on a
  * corpus crafted to hit each case, e23's one-sided CMS guarantee
  * (est >= true always, with real collisions present at the tested
  * density), and e24's strict contiguity (an intervening event breaks
  * the match where every funnel operator would still convert).
  */
class SpanSketchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("span-sketch-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("d20: overlapping grams merge to one span; disjoint spans count " +
      "separately; within-doc repeats are duplicates; unique docs are clean") {
    import spark.implicits._
    val dir = Files.createTempDirectory("d20edge").toString
    // "a b c d" and "b c d e" each occur in doc 1 AND doc 2; doc 3 repeats
    // "p q r s" twice WITHIN itself (its other grams are unique); doc 4 is
    // all-unique. K = 4.
    Seq(
      (1L, "a b c d e x1 x2", "en", "s0", 0L),
      (2L, "z1 a b c d z2 b c d e", "en", "s0", 0L),
      (3L, "p q r s p q r s", "en", "s0", 0L),
      (4L, "u1 u2 u3 u4 u5", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("d20_dup_span_removal")(spark, dir)
      .select("doc_id", "n_tokens", "dup_tokens", "n_spans")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // doc 1: covered 0-3 ("a b c d") union 1-4 ("b c d e") = 0-4: ONE span
      (1L, 7L, 5L, 1L),
      // doc 2: covered 1-4 and 6-9 — two disjoint spans
      (2L, 10L, 8L, 2L),
      // doc 3: "p q r s" at 0 and 4 (same doc!) — 0-3 and 4-7 touch: ONE span
      (3L, 8L, 8L, 1L),
      // doc 4: nothing duplicated
      (4L, 5L, 0L, 0L)), s"got: $out")
  }

  test("d23: the rewrite keeps the globally-first occurrence and cuts the " +
      "rest; clean docs pass through verbatim; cut coverage never exceeds " +
      "d20's dup coverage") {
    import spark.implicits._
    val dir = Files.createTempDirectory("d23edge").toString
    // same crafted corpus as the d20 gate (K = 4)
    Seq(
      (1L, "a b c d e x1 x2", "en", "s0", 0L),
      (2L, "z1 a b c d z2 b c d e", "en", "s0", 0L),
      (3L, "p q r s p q r s", "en", "s0", 0L),
      (4L, "u1 u2 u3 u4 u5", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("d23_span_dedup_rewrite")(spark, dir)
      .select("doc_id", "n_tokens", "kept_tokens", "cut_tokens", "text_dedup")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 owns the first occurrence of both dup grams → fully kept
    assert(out(1L) == ((1L, 7L, 7L, 0L, "a b c d e x1 x2")))
    // doc 2's copies are later occurrences → tokens 1-4 and 6-9 cut
    assert(out(2L) == ((2L, 10L, 2L, 8L, "z1 z2")))
    // doc 3: within-doc repeat — only "p q r s" itself is duplicated (the
    // rotations "q r s p" etc. occur once each); the first occurrence at
    // pos 0 is kept, the pos-4 copy is cut (tokens 4-7). d20 reports all
    // 8 tokens as dup-COVERED; the rewrite keeps the owner's 4.
    assert(out(3L) == ((3L, 8L, 4L, 4L, "p q r s")))
    // doc 4: untouched
    assert(out(4L) == ((4L, 5L, 5L, 0L, "u1 u2 u3 u4 u5")))

    // structural bound vs d20: a cut token is always dup-covered
    val d20 = graft.SparkEntry.queries("d20_dup_span_removal")(spark, dir)
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    out.values.foreach { case (id, _, _, cut, _) =>
      assert(cut <= d20(id), s"doc $id: cut $cut > dup-covered ${d20(id)}")
    }
  }

  test("e23: est >= true for every reported user, with real collisions " +
      "at 200 users over 64 buckets, and the true top hitter ranked first") {
    import spark.implicits._
    val dir = Files.createTempDirectory("e23cms").toString
    // user 0 gets 50 events (the heavy hitter), users 1..199 get one each:
    // 200 keys into W=64 buckets makes all-4-row collisions near-certain,
    // so the sketch must actually overestimate somewhere (lossy regime),
    // while never underestimating anywhere (the CMS guarantee).
    val rows = (Seq.fill(50)(0L) ++ (1L until 200L)).zipWithIndex.map {
      case (u, i) => (i.toLong, new Timestamp(1700000000000L + i * 1000L),
        u, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = graft.SparkEntry.queries("e23_cmsketch_heavy_hitters")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out.size == 20)
    assert(out.forall { case (_, n, est, _) => est >= n },
      s"CMS underestimated: ${out.filter(r => r._3 < r._2)}")
    assert(out.exists { case (_, n, est, _) => est > n },
      "no collision at 200 users / 64 buckets — sketch not in its lossy regime")
    assert(out.head == ((0L, 50L, out.head._3, 1)), s"top row: ${out.head}")
  }

  test("e24: strict contiguity — an intervening non-click breaks vc*p " +
      "where relaxed funnels would convert; bursts need >=2 CONSECUTIVE errors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("e24cep").toString
    // user 1 timeline: v c c p           -> 1 match (quantifier spans clicks)
    // user 2 timeline: v c E c p         -> 0     (error breaks contiguity;
    //                                              e03's relaxed funnel counts this)
    // user 3 timeline: v p e e e v p     -> 2 conv ('vp' twice), 1 burst ('eee')
    // user 4 timeline: e v e             -> 0 bursts (isolated errors)
    val types = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase", 'e' -> "error")
    val rows = Seq(
      1L -> "vccp", 2L -> "vcecp", 3L -> "vpeeevp", 4L -> "eve").flatMap {
      case (u, tl) => tl.zipWithIndex.map { case (ch, i) =>
        (u * 100L + i, new Timestamp(1700000000000L + i * 60000L), u,
          types(ch), 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = graft.SparkEntry.queries("e24_cep_pattern")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 1L, 0L),
      (2L, 5L, 0L, 0L),
      (3L, 7L, 2L, 1L),
      (4L, 3L, 0L, 0L)), s"got: $out")
  }
}
