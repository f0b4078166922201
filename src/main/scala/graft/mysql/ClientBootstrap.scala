package graft.mysql

import graft.cdc._

/** S3 — the initial full-sync bootstrap, driven over the client protocol
  * instead of a `mysqldump` child process (the reference shells out:
  * /root/reference/dump/dump.go:145-243 exec + io.Pipe into the parser;
  * the Spark-side design needs no external binary — the same consistent
  * snapshot comes from the protocol):
  *
  *   1. `FLUSH TABLES WITH READ LOCK`, then `START TRANSACTION WITH
  *      CONSISTENT SNAPSHOT` under REPEATABLE READ, then `SHOW MASTER
  *      STATUS` still under the lock, then `UNLOCK TABLES` — mysqldump's
  *      --single-transaction --master-data order, which makes the
  *      position EXACTLY the snapshot point (the streaming phase resumes
  *      from it; dump.go's --master-data line, consumed by
  *      DumpParser.bootstrap the same way);
  *   3. per table: `SHOW CREATE TABLE` → schema mirror, `SELECT *` →
  *      chunked INSERT operations (row images in the same stringly model
  *      the binlog path produces).
  *
  * The output contract matches `DumpParser.bootstrap`: (operations,
  * resume Progress), with the tracker populated — everything downstream is
  * bootstrap-source-agnostic.
  */
final class ClientBootstrap(
    client: BinlogClient,
    tracker: SchemaTracker,
    rowsPerOp: Int = 256) {

  private val SystemDbs = Set("mysql", "information_schema", "performance_schema", "sys")

  final case class Bootstrap(ops: Vector[Operation], resume: Progress)

  private def rs(sql: String): client.ResultSet = client.query(sql) match {
    case Left(r) => r
    case Right(_) => throw new IllegalStateException(s"expected resultset for: $sql")
  }
  private def exec(sql: String): Unit = client.query(sql) match {
    case Right(_) => ()
    case Left(_) => throw new IllegalStateException(s"expected OK for: $sql")
  }

  def run(includeDbs: Seq[String] = Nil): Bootstrap = {
    // mysqldump --single-transaction --master-data order: the read lock
    // pins the binlog while the snapshot opens, so the position read
    // below is EXACTLY the snapshot point. Opening the snapshot first and
    // reading the position afterwards unlocked would LOSE any transaction
    // committing in between — invisible to the snapshot yet at-or-before
    // the resume position, so never replayed (silent data loss).
    exec("FLUSH TABLES WITH READ LOCK;")
    exec("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ;")
    exec("START TRANSACTION WITH CONSISTENT SNAPSHOT;")

    // resume position under the lock: rows at-or-before it are in the
    // dump, everything after replays from the binlog (T1 contract)
    val status = rs("SHOW MASTER STATUS;")
    require(status.rows.nonEmpty, "server has no binlog position (is log_bin on?)")
    val file = status.getString(0, 0).getOrElse("")
    val pos = status.getString(0, 1).map(_.toLong).getOrElse(0L)
    exec("UNLOCK TABLES;") // the snapshot read view is established; release writers

    // the master's server_id, so the resume Progress compares cleanly
    // against the live stream's checkpoints (alignedProgress/T6 requires
    // matching server ids; 0 here would poison every later comparison)
    val serverId = rs("SELECT @@server_id;").getString(0, 0)
      .map(_.toLong).getOrElse(0L)

    val dbs = rs("SHOW DATABASES;").rows.flatMap(_.headOption.flatten)
      .filterNot(SystemDbs)
      .filter(db => includeDbs.isEmpty || includeDbs.contains(db))

    val ops = Vector.newBuilder[Operation]
    dbs.foreach { db =>
      tracker.createDatabase(db)
      val tables = rs(s"SHOW TABLES FROM `$db`;").rows.flatMap(_.headOption.flatten)
      tables.foreach { table =>
        val create = rs(s"SHOW CREATE TABLE `$db`.`$table`;").getString(0, 1)
          .getOrElse(throw new IllegalStateException(s"no CREATE for $db.$table"))
        tracker.execDdl(create, db)
        val tdef = tracker.getTableDef(db, table).getOrElse(
          throw new IllegalStateException(s"tracker has no def for $db.$table after DDL"))
        val data = rs(s"SELECT * FROM `$db`.`$table`;")
        data.rows.grouped(rowsPerOp).foreach { chunk =>
          ops += Operation(
            OperationHeader(serverId, OpType.Insert, 0L, 0L),
            database = Some(db),
            table = Some(tdef),
            rows = chunk.map(vals => OpRow(None, Some(vals))).toVector)
        }
      }
    }
    exec("COMMIT;")

    Bootstrap(ops.result(), Progress(file, pos, serverId))
  }
}
