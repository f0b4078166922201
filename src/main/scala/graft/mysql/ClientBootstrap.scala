package graft.mysql

import graft.cdc._

/** S3 — the initial full-sync bootstrap, driven over the client protocol
  * instead of a `mysqldump` child process (the reference shells out:
  * /root/reference/dump/dump.go:145-243 exec + io.Pipe into the parser;
  * the Spark-side design needs no external binary — the same consistent
  * snapshot comes from the protocol):
  *
  *   1. `START TRANSACTION WITH CONSISTENT SNAPSHOT` under REPEATABLE READ
  *      (what mysqldump --single-transaction does);
  *   2. `SHOW MASTER STATUS` inside the snapshot → the binlog position the
  *      streaming phase resumes from (dump.go's --master-data line,
  *      consumed by DumpParser.bootstrap the same way);
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
    exec("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ;")
    exec("START TRANSACTION WITH CONSISTENT SNAPSHOT;")

    // resume position INSIDE the snapshot: rows at-or-before it are in the
    // dump, everything after replays from the binlog (T1 contract)
    val status = rs("SHOW MASTER STATUS;")
    require(status.rows.nonEmpty, "server has no binlog position (is log_bin on?)")
    val file = status.getString(0, 0).getOrElse("")
    val pos = status.getString(0, 1).map(_.toLong).getOrElse(0L)

    val dbs = rs("SHOW DATABASES;").rows.flatMap(_.headOption.flatten)
      .filterNot(SystemDbs)
      .filter(db => includeDbs.isEmpty || includeDbs.contains(db))

    val ops = Vector.newBuilder[Operation]
    var serverIdSeen = 0L
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
            OperationHeader(serverIdSeen, OpType.Insert, 0L, 0L),
            database = Some(db),
            table = Some(tdef),
            rows = chunk.map(vals => OpRow(None, Some(vals))).toVector)
        }
      }
    }
    exec("COMMIT;")

    Bootstrap(ops.result(), Progress(file, pos, serverIdSeen))
  }
}
