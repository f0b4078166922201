package graft.cdc

import scala.util.matching.Regex

/** mysqldump text-stream parser — the S3/S4 bootstrap path (SURVEY.md §2.1)
  * re-expressed in Scala: statements accumulate across lines until a
  * trailing `;`, the replication coordinates (`CHANGE MASTER TO ...` /
  * `GTID_PURGED`) are captured once, `USE` tracks the current database,
  * `CREATE ...` statements replay into the schema tracker, and
  * `INSERT INTO ... VALUES (...)` rows pass through the quote- and
  * escape-aware tokenizer (X3) + MySQL string unescape (X2).
  *
  * Behavioral reference: /root/reference/dump/parser.go:38-245 (regexes
  * :53-60, statement loop :64-145, VALUES tokenizer :147-200, unescape
  * :205-245) and the schema-only consumer /root/reference/canal/dump.go:30-69
  * (Data is a no-op for schema bootstrap; binlog/gtid seed the resume
  * Progress). Like the reference, quoted string values RETAIN their
  * surrounding single quotes — the consumer decides quoting semantics.
  */
object DumpParser {

  trait Handler {
    def binlog(name: String, pos: Long): Unit = ()
    def gtid(gtid: String): Unit = ()
    def ddl(db: String, statement: String): Unit = ()
    def data(db: String, table: String, values: Vector[String]): Unit = ()
  }

  private val BinlogRe: Regex =
    """^CHANGE MASTER TO MASTER_LOG_FILE='(.+)', MASTER_LOG_POS=(\d+);""".r
  private val GtidPurgedRe: Regex = """^SET @@GLOBAL.GTID_PURGED='(.+)';""".r
  private val GtidSlaveRe: Regex = """SET GLOBAL gtid_slave_pos='(.+)';""".r
  private val UseRe: Regex = """^USE `(.+)`;""".r
  private val ValuesRe: Regex = """^INSERT INTO `(.+?)` VALUES \((.+)\);$""".r

  def parse(
      lines: Iterator[String],
      h: Handler,
      parseBinlogPos: Boolean = true,
      parseGtidSet: Boolean = true): Unit = {
    var db = ""
    var gtidDone = false
    var binlogDone = false
    val stmt = new StringBuilder
    lines.foreach { raw =>
      val line = raw.replaceAll("[\r\n]+$", "")
      stmt.append(line)
      if (line.nonEmpty && line.endsWith(";")) {
        val sql = stmt.toString
        stmt.clear()
        if (parseGtidSet && !gtidDone) {
          (GtidPurgedRe.findFirstMatchIn(sql) orElse GtidSlaveRe.findFirstMatchIn(sql))
            .foreach { m => h.gtid(m.group(1)); gtidDone = true }
        }
        if (parseBinlogPos && !binlogDone) {
          BinlogRe.findFirstMatchIn(sql).foreach { m =>
            h.binlog(m.group(1), m.group(2).toLong); binlogDone = true
          }
        }
        UseRe.findFirstMatchIn(sql).foreach(m => db = m.group(1))
        if (sql.startsWith("CREATE")) h.ddl(db, sql)
        ValuesRe.findFirstMatchIn(sql).foreach { m =>
          h.data(db, m.group(1), parseValues(m.group(2)))
        }
      }
    }
  }

  /** X3: quote- and escape-aware tokenizer of a VALUES tuple body.
    * Unquoted tokens read to the next comma; quoted tokens scan to the
    * closing quote, skipping backslash-escaped characters. Quoted values
    * keep their quotes; escapes are resolved only if present. */
  def parseValues(str: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) != '\'') {
        var j = i + 1
        while (j < str.length && str.charAt(j) != ',') j += 1
        out += str.substring(i, j)
        i = j + 1
      } else {
        var j = i + 1
        var escaped = false
        var closed = false
        while (j < str.length && !closed) {
          str.charAt(j) match {
            case '\\' => escaped = true; j += 2
            case '\'' => closed = true
            case _ => j += 1
          }
        }
        if (!closed) throw new IllegalArgumentException(s"unterminated quote in: $str")
        val v = str.substring(i, j + 1)
        out += (if (escaped) unescape(v) else v)
        i = j + 2
      }
    }
    out.result()
  }

  /** X2: MySQL string-literal unescape (string-literals per the MySQL
    * manual): \n \0 \b \Z \r \t map to control bytes; any other escaped
    * char (incl. \' \" \\) maps to itself; a trailing lone backslash is
    * dropped. */
  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\') {
        if (i + 1 < s.length) {
          b.append(s.charAt(i + 1) match {
            case 'n' => '\n'
            case '0' => '\u0000'
            case 'b' => '\b'
            case 'Z' => '\u001a'
            case 'r' => '\r'
            case 't' => '\t'
            case c => c
          })
        }
        i += 2
      } else {
        b.append(s.charAt(i))
        i += 1
      }
    }
    b.toString
  }

  /** Bootstrap a SchemaTracker (+ resume Progress) from a dump text stream —
    * the dumpParseHandler shape: DDL replays into the tracker, data rows are
    * ignored (schema-only dump), coordinates become the starting Progress. */
  def bootstrap(lines: Iterator[String], tracker: SchemaTracker, serverId: Long = 0L): Progress = {
    var pos = Position("", 0L, serverId)
    var gset: Option[Gset] = None
    parse(lines, new Handler {
      override def binlog(name: String, p: Long): Unit = pos = Position(name, p, serverId)
      override def gtid(g: String): Unit = gset = Some(Gset.parse(g))
      override def ddl(db: String, statement: String): Unit = tracker.execDdl(statement, db)
    })
    Progress(pos, gset)
  }
}
