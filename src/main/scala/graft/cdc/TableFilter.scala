package graft.cdc

import scala.collection.concurrent.TrieMap
import scala.util.matching.Regex

/** The reference's TWO regex table filters have DIFFERENT empty-list truth
  * tables — both are preserved here (SURVEY.md §2.2 F1/F2):
  *
  *  - [[CanalTableFilter]] (global, F1 — /root/reference/canal/canal.go:290-326):
  *    nothing configured ⇒ include everything; otherwise start EXCLUDED,
  *    an include match rescues, an exclude match overrides.
  *  - [[SinkTableFilter]] (per-sink, F2 — /root/reference/canal/handler_mux.go:49-78):
  *    BOTH lists empty ⇒ NOT ignored; otherwise start IGNORED, include
  *    rescues, exclude re-ignores.
  *
  * Matches are memoized per key like the reference's caches. In Spark these
  * become broadcast predicates evaluated in the decode stage; the memo is
  * executor-local.
  */
final class CanalTableFilter(includes: Seq[Regex], excludes: Seq[Regex]) extends Serializable {
  private val cache = TrieMap.empty[String, Boolean]
  private val configured = includes.nonEmpty || excludes.nonEmpty

  def matches(db: String, table: String): Boolean = matchesKey(s"$db.$table")

  def matchesKey(key: String): Boolean =
    if (!configured) true
    else cache.getOrElseUpdate(key, {
      var ok = includes.exists(_.findFirstIn(key).isDefined)
      if (ok && excludes.exists(_.findFirstIn(key).isDefined)) ok = false
      ok
    })
}

object CanalTableFilter {
  def apply(includes: Seq[String], excludes: Seq[String]): CanalTableFilter =
    new CanalTableFilter(includes.map(_.r), excludes.map(_.r))
}

final class SinkTableFilter(includes: Seq[Regex], excludes: Seq[Regex]) extends Serializable {
  private val cache = TrieMap.empty[String, Boolean]

  def isIgnored(db: String, table: String): Boolean = {
    if (includes.isEmpty && excludes.isEmpty) return false
    val key = s"$db.$table"
    cache.getOrElseUpdate(key, {
      var ignored = true
      if (includes.exists(_.findFirstIn(key).isDefined)) ignored = false
      if (excludes.exists(_.findFirstIn(key).isDefined)) ignored = true
      ignored
    })
  }
}

object SinkTableFilter {
  def apply(includes: Seq[String], excludes: Seq[String]): SinkTableFilter =
    new SinkTableFilter(includes.map(_.r), excludes.map(_.r))
}

/** Per-sink duplicate-event filter for restart exactly-once (F3 —
  * /root/reference/canal/handler_mux.go:81-103): until the stream catches up
  * with the sink's checkpointed progress, events at-or-below it are dropped.
  * A different server_id can't be compared — treated as new (failover);
  * the catch-up latch then stays open.
  */
final class DuplicateEventFilter(checkpoint: Progress) extends Serializable {
  private var catchUp = false

  def isDuplicated(serverId: Long, logName: String, logPos: Long): Boolean = {
    if (catchUp) return false
    val pos = Position(logName, logPos, serverId)
    if (checkpoint.isZero ||
      pos.serverId != checkpoint.pos.serverId ||
      pos.compare(checkpoint.pos) > 0) {
      catchUp = true
      false
    } else true
  }

  def isCaughtUp: Boolean = catchUp
}
