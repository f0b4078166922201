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

  def note(artifactPath: String, fresh: Seq[(String, Double)]): String = {
    val prevPath = sys.env.getOrElse(PrevEnvKey, artifactPath)
    val f = new java.io.File(prevPath)
    if (!f.isFile) return "" // first run ever: nothing to compare against
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val parts = fresh.flatMap { case (k, v) =>
        Option(if (node == null) null else node.get(k))
          .filter(_.isNumber).map(_.asDouble).filter(_ > 0)
          .map { p => f"$k ${fmt(p)}->${fmt(v)} (${v / p}%.2fx)" }
      }
      if (parts.isEmpty) {
        System.err.println(s"[bench] WARN: prev artifact $prevPath exists " +
          "but yielded no comparable fields — vs_prev OMITTED")
        ""
      } else s"prev-vs-this(${f.getName}): " + parts.mkString(", ")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] WARN: failed to parse prev artifact $prevPath: $e")
        ""
    }
  }

  private def fmt(v: Double): String =
    if (v == v.floor && v.abs < 1e15) v.toLong.toString else f"$v%.2f"
}
