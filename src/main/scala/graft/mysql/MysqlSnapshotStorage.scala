package graft.mysql

import graft.cdc.{Position, SchemaSnapshotCodec, TableDef}

/** MySQL-backed schema-snapshot storage — the twin of the reference's
  * mysqlStorage (/root/reference/schema/storage_mysql.go:27-140): snapshots
  * live in a `tb_schema_data` table on a MySQL the operator owns, written
  * through the SAME hand-rolled client (COM_QUERY) the live source uses —
  * no driver dependency. Binary payloads travel as hex literals on the
  * way in and `HEX(snapshot)` on the way out, keeping everything inside
  * the text protocol.
  */
final class MysqlSnapshotStorage(client: BinlogClient, table: String = "tb_schema_data",
    snapshotEvery: Int = 8) {

  private var sinceSnapshot = 0 // DDLs recorded since the last full snapshot

  /** CREATE TABLE IF NOT EXISTS, the reference's initQuery. */
  def init(): Unit =
    exec(s"""CREATE TABLE IF NOT EXISTS $table (
      id INT NOT NULL AUTO_INCREMENT,
      name VARCHAR(255) NOT NULL DEFAULT '' COMMENT 'binlog name',
      pos INT UNSIGNED NOT NULL DEFAULT 0 COMMENT 'binlog pos',
      server_id BIGINT NOT NULL DEFAULT 0 COMMENT 'origin server',
      snapshot LONGBLOB NOT NULL COMMENT 'snapshot of schema',
      type ENUM('snapshot','statement') NOT NULL DEFAULT 'snapshot',
      create_time DATETIME NOT NULL DEFAULT CURRENT_TIMESTAMP,
      PRIMARY KEY(id))""")

  def save(pos: Position, databases: Seq[String], defs: Seq[TableDef]): Unit = {
    val hex = SchemaSnapshotCodec.encode(pos, databases, defs)
      .map(b => f"${b & 0xff}%02x").mkString
    exec(s"INSERT INTO $table SET name='${pos.name}', pos=${pos.pos}, " +
      s"server_id=${pos.serverId}, snapshot=x'$hex', type='snapshot'")
    purge()
  }

  /** Statement-level incremental persistence — the `type='statement'` rows
    * this table's schema (and the reference's) anticipates: append one
    * (position, db, statement) record per applied DDL; write a full
    * snapshot only on the first DDL and every `snapshotEvery`-th after it.
    * Same contract as the file store's `record` — restore = `load` +
    * `ddlTail` replay. The payload is `db NUL statement` (a database name
    * cannot contain NUL), hex on the wire like the snapshot blobs. */
  def record(pos: Position, currentDb: String, statement: String,
      databases: => Seq[String], defs: => Seq[TableDef],
      forceSnapshot: Boolean = false): Unit = {
    val payload = (currentDb + "\u0000" + statement).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hex = payload.map(b => f"${b & 0xff}%02x").mkString
    exec(s"INSERT INTO $table SET name='${pos.name}', pos=${pos.pos}, " +
      s"server_id=${pos.serverId}, snapshot=x'$hex', type='statement'")
    val snapshotNow = forceSnapshot ||
      sinceSnapshot == 0 || sinceSnapshot >= snapshotEvery
    sinceSnapshot = if (snapshotNow) 1 else sinceSnapshot + 1
    if (snapshotNow) save(pos, databases, defs)
  }

  /** Statement records with `after < position ≤ upTo` (same server), in
    * insertion order, DEDUPLICATED by position — a restart that re-applies
    * a DDL re-inserts its row, and replaying both would double-apply the
    * DDL on restore (see the file store's ddlTail note). */
  def ddlTail(after: Position, upTo: Position): Vector[(Position, String, String)] =
    query(s"SELECT name, pos, HEX(snapshot) FROM $table WHERE type='statement' " +
      s"AND server_id=${upTo.serverId} " +
      s"AND (name > '${after.name}' OR (name = '${after.name}' AND pos > ${after.pos})) " +
      s"AND (name < '${upTo.name}' OR (name = '${upTo.name}' AND pos <= ${upTo.pos})) " +
      "ORDER BY id").map { rs =>
      val seen = scala.collection.mutable.Set.empty[Position]
      rs.rows.flatMap { row =>
        (row.lift(0).flatten, row.lift(1).flatten, row.lift(2).flatten) match {
          case (Some(name), Some(p), Some(hex)) =>
            val pos = Position(name, p.toLong, upTo.serverId)
            val payload = new String(unhex(hex), java.nio.charset.StandardCharsets.UTF_8)
            val nul = payload.indexOf('\u0000')
            if (nul < 0 || !seen.add(pos)) None
            else Some((pos, payload.substring(0, nul), payload.substring(nul + 1)))
          case _ => None
        }
      }.toVector
    }.getOrElse(Vector.empty)

  /** Newest snapshot (the reference's LoadLastSnapshot). */
  def loadLast(): Option[(Position, Vector[String], Vector[TableDef])] =
    query(s"SELECT HEX(snapshot) FROM $table WHERE type='snapshot' " +
      "ORDER BY id DESC LIMIT 1")
      .flatMap(_.rows.headOption.flatMap(_.headOption.flatten))
      .map(h => SchemaSnapshotCodec.decode(unhex(h)))

  /** Newest snapshot at-or-below `pos` on the same server — the restore-
    * at-position contract the file store implements (tracker.go:54-72). */
  def load(pos: Position): Option[(Position, Vector[String], Vector[TableDef])] =
    query(s"SELECT HEX(snapshot) FROM $table WHERE type='snapshot' " +
      s"AND server_id=${pos.serverId} " +
      s"AND (name < '${pos.name}' OR (name = '${pos.name}' AND pos <= ${pos.pos})) " +
      "ORDER BY name DESC, pos DESC LIMIT 1")
      .flatMap(_.rows.headOption.flatMap(_.headOption.flatten))
      .map(h => SchemaSnapshotCodec.decode(unhex(h)))

  /** The reference's purge: drop rows older than 7 days, but never the
    * newest snapshot (storage_mysql.go:158-178). */
  def purge(): Unit =
    exec(s"DELETE FROM $table WHERE id < " +
      s"(SELECT id FROM (SELECT MAX(id) AS id FROM $table WHERE type='snapshot') x) " +
      "AND datediff(curdate(), create_time) >= 7")

  private def exec(sql: String): Unit = client.query(sql) match {
    case Right(_) => ()
    case Left(_) => throw new IllegalStateException(s"expected OK for: $sql")
  }

  private def query(sql: String): Option[BinlogClient#ResultSet] = client.query(sql) match {
    case Left(rs) => Some(rs)
    case Right(_) => None
  }

  private def unhex(h: String): Array[Byte] =
    Array.tabulate(h.length / 2)(i =>
      Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte)
}
