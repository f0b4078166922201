package graft

/** Machine-derived prev-vs-this sentence for the AUXILIARY bench artifacts
  * (`BENCH_cdc.json`, `BENCH_ingest.json`, `BENCH_media.json`) — r15
  * "What's wrong" 4: these throughputs were refreshed every round but not
  * trend-tracked anywhere, so a CDC/ingest/media regression had to be
  * noticed by eye while the query suite's regressions are machine-visible.
  *
  * Each bench main calls [[note]] with its headline numeric keys BEFORE
  * (over)writing its artifact and embeds the sentence as a `vs_prev` JSON
  * field. The comparison baseline is `SPARK_GRAFT_AUX_PREV` when set (the
  * evidence script exports the previous ROUND's committed artifact via
  * `git show`, so a same-round driver re-run still compares against the
  * real previous round), else the on-disk artifact about to be
  * overwritten (a bare manual run still gets the comparison). A baseline
  * that exists but yields nothing comparable WARNS instead of silently
  * dropping the clause — same contract as Bench's auto-vs-prev. */
object BenchPrev {

  /** Env var the evidence script points at the previous round's committed
    * copy of the artifact being regenerated. */
  val PrevEnvKey = "SPARK_GRAFT_AUX_PREV"

  /** The returned sentence is JSON-STRING-SAFE: every caller interpolates
    * it into a hand-built JSON line (`"vs_prev":"$note"`), so quotes and
    * backslashes — possible in a future key or artifact name — are escaped
    * HERE rather than trusted to never occur (r16 ADVICE), and all numbers
    * format under Locale.ROOT so a comma-decimal default locale cannot
    * emit `1,24x` into the artifact. */
  def note(artifactPath: String, fresh: Seq[(String, Double)]): String = {
    val prevPath = sys.env.getOrElse(PrevEnvKey, artifactPath)
    val f = new java.io.File(prevPath)
    if (!f.isFile) return "" // first run ever: nothing to compare against
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val parts = fresh.flatMap { case (k, v) =>
        Option(if (node == null) null else node.get(k))
          .filter(_.isNumber).map(_.asDouble).filter(_ > 0)
          .map { p => s"$k ${fmt(p)}->${fmt(v)} (${ratio(v / p)}x)" }
      }
      if (parts.isEmpty) {
        System.err.println(s"[bench] WARN: prev artifact $prevPath exists " +
          "but yielded no comparable fields — vs_prev OMITTED")
        ""
      } else jsonSafe(s"prev-vs-this(${f.getName}): " + parts.mkString(", "))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARN: failed to parse prev artifact $prevPath: $e")
        ""
    }
  }

  /** Escape for embedding inside a hand-built JSON string literal. */
  private[graft] def jsonSafe(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => " " // control chars would also break the line
      case c => c.toString
    }

  private[graft] def ratio(r: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(r))

  private def fmt(v: Double): String =
    if (v == v.floor && v.abs < 1e15) v.toLong.toString
    else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
}
