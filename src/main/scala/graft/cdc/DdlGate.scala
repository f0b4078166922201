package graft.cdc

/** T7: the DDL-failure park/repair loop (SURVEY.md §2.8). A DDL the schema
  * interpreter cannot parse or apply must NOT be silently skipped — the
  * schema mirror would drift and every subsequent row decode would be
  * wrong. Instead the pipeline parks: the failed statement is exposed for
  * inspection, an operator can execute a corrected statement and/or retry,
  * or explicitly skip. Mirrors the reference's parked-DDL workflow
  * (/root/reference/canal/sync.go:237-257 retry loop,
  * /root/reference/cmd/dolphinbeat/hook.go:27-49 park + retry channel,
  * /root/reference/cmd/dolphinbeat/http_handler.go:124-166 the
  * /ddl/failed|exec|retry admin surface).
  *
  * In the Spark pipeline this sits at the micro-batch boundary where DDL
  * operations replay into the tracked catalog: `apply` returning false
  * means "stop consuming further batches until repaired" (park the
  * streaming query), exactly the reference's drain-then-block behavior.
  */
final class DdlGate(val tracker: SchemaTracker, onPark: () => Unit = () => ()) {

  final case class FailedDdl(db: String, statement: String, error: String)

  @volatile private var parkedDdl: Option[FailedDdl] = None

  def isParked: Boolean = parkedDdl.isDefined
  def failed: Option[FailedDdl] = parkedDdl

  /** Replay one DDL. True = applied (or already parked statement retried
    * successfully); false = failed and now parked.
    *
    * While parked, only the parked statement itself may be replayed (a
    * retry); any OTHER statement is refused loudly. Otherwise a caller
    * that keeps replaying DDL past a park would silently discard the
    * failed statement — exactly the schema drift the park exists to
    * prevent. Unparking is only via a successful retry of the same
    * statement, retry(), or an explicit skip(). */
  def apply(statement: String, db: String): Boolean = parkedDdl match {
    case Some(f) if f.statement != statement || f.db != db =>
      throw new IllegalStateException(
        s"DDL gate is parked on [${f.db}] ${f.statement}; retry(), exec()+skip(), or skip() before replaying further DDL")
    case _ =>
      try {
        tracker.execDdl(statement, db)
        parkedDdl = None
        true
      } catch {
        case e: Exception =>
          parkedDdl = Some(FailedDdl(db, statement, e.getMessage))
          onPark() // metrics: failed_ddl_total
          false
      }
  }

  /** Set when an operator repair mutated the tracker OUT OF BAND of the
    * replicated stream: such mutations have no stream position and cannot
    * live in the statement-level DDL log, so the next recorded stream DDL
    * must write a FULL snapshot regardless of cadence — otherwise a
    * restart restoring snapshot + logged tail silently loses the repair. */
  @volatile private var repairedSinceSnapshot = false

  /** True once per repair: the persist path consumes the flag when it
    * forces the full snapshot that captures the repair. */
  def consumeRepairFlag(): Boolean = synchronized {
    val r = repairedSinceSnapshot
    repairedSinceSnapshot = false
    r
  }

  /** Operator repair: run a corrected statement against the tracker
    * (the /ddl/exec endpoint). Does not unpark by itself. */
  def exec(statement: String, db: String): Either[String, Unit] =
    try {
      tracker.execDdl(statement, db)
      repairedSinceSnapshot = true
      Right(())
    }
    catch { case e: Exception => Left(e.getMessage) }

  /** Retry the parked statement (the /ddl/retry endpoint). */
  def retry(): Boolean = parkedDdl match {
    case Some(f) => apply(f.statement, f.db)
    case None => true
  }

  /** Skip the parked statement — operator asserts the mirror is already
    * correct (e.g. repaired via exec). */
  def skip(): Unit = parkedDdl = None
}
