package graft.cdc

import scala.collection.mutable

/** In-memory schema mirror maintained by replaying DDL — the role of the
  * reference's tracker + external ddl-executor
  * (/root/reference/schema/tracker.go:26-34, 110-150). The reference
  * outsources MySQL grammar to a TiDB-based parser; this implementation
  * interprets the DDL subset its tests exercise (SURVEY.md §7 step 2):
  *
  *   CREATE/DROP DATABASE, CREATE/DROP TABLE, TRUNCATE,
  *   ALTER TABLE ADD/DROP/MODIFY/CHANGE COLUMN (FIRST/AFTER), ALTER RENAME,
  *   RENAME TABLE.
  *
  * Unparseable DDL throws DdlParseException — the pipeline parks it for
  * manual repair, mirroring the reference's failed-DDL loop (T7,
  * /root/reference/canal/sync.go:237-257).
  */
final class SchemaTracker {
  // db -> (table -> def), insertion-ordered for stable listings.
  // All public accessors synchronize on this: the admin HTTP thread
  // reads the mirror (GET /schema*) while the pipeline thread replays
  // DDL into it — unsynchronized LinkedHashMap iteration during a
  // rehash throws ConcurrentModificationException or returns garbage.
  // DDL rate is human-scale; the coarse lock costs nothing.
  private val dbs = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, TableDef]]

  def getDatabases: Vector[String] = synchronized(dbs.keys.toVector)
  def getTables(db: String): Vector[String] = synchronized(
    dbs.get(db).map(_.keys.toVector).getOrElse(Vector.empty))
  def getTableDef(db: String, table: String): Option[TableDef] = synchronized(
    dbs.get(db).flatMap(_.get(table)))

  def createDatabase(db: String): Unit = synchronized(
    dbs.getOrElseUpdate(db, mutable.LinkedHashMap.empty))

  def snapshotCatalog: Vector[TableDef] = synchronized(
    dbs.values.flatMap(_.values).toVector)

  def restoreCatalog(defs: Seq[TableDef], databases: Seq[String]): Unit = synchronized {
    dbs.clear()
    databases.foreach(d => dbs.getOrElseUpdate(d, mutable.LinkedHashMap.empty))
    defs.foreach { t =>
      dbs.getOrElseUpdate(t.database, mutable.LinkedHashMap.empty).update(t.name, t)
    }
  }

  /** True if the statement parses under the tracked DDL subset. */
  def isDdl(statement: String): Boolean =
    DdlParser.parse(statement, "").isDefined

  /** Replay one DDL against the mirror. `currentDb` resolves unqualified
    * table names (the binlog QUERY event's schema field). */
  def execDdl(statement: String, currentDb: String): Unit = {
    val ddl = DdlParser.parse(statement, currentDb)
      .getOrElse(throw new DdlParseException(statement))
    synchronized(apply(ddl))
  }

  private def apply(ddl: Ddl): Unit = ddl match {
    case CreateDatabase(db, ifNotExists) =>
      if (dbs.contains(db) && !ifNotExists) throw new DdlApplyException(s"database exists: $db")
      createDatabase(db)
    case DropDatabase(db, ifExists) =>
      if (!dbs.contains(db) && !ifExists) throw new DdlApplyException(s"no such database: $db")
      dbs.remove(db)
    case CreateTable(db, name, cols, ifNotExists) =>
      val tables = dbs.getOrElseUpdate(db, mutable.LinkedHashMap.empty)
      if (tables.contains(name)) {
        if (!ifNotExists) throw new DdlApplyException(s"table exists: $db.$name")
      } else tables.update(name, TableDef(db, name, cols))
    case DropTable(targets, ifExists) =>
      targets.foreach { case (db, name) =>
        val removed = dbs.get(db).flatMap(_.remove(name))
        if (removed.isEmpty && !ifExists) throw new DdlApplyException(s"no such table: $db.$name")
      }
    case Truncate(_, _) => () // data-only; schema unchanged
    case RenameTable(pairs) =>
      pairs.foreach { case ((fdb, fname), (tdb, tname)) =>
        val t = dbs.get(fdb).flatMap(_.remove(fname))
          .getOrElse(throw new DdlApplyException(s"no such table: $fdb.$fname"))
        dbs.getOrElseUpdate(tdb, mutable.LinkedHashMap.empty)
          .update(tname, t.copy(database = tdb, name = tname))
      }
    case AlterTable(db, name, specs) =>
      val tables = dbs.getOrElse(db,
        throw new DdlApplyException(s"no such database: $db"))
      var t = tables.getOrElse(name, throw new DdlApplyException(s"no such table: $db.$name"))
      specs.foreach { spec => t = applyAlter(t, spec) }
      tables.remove(name)
      dbs.getOrElseUpdate(t.database, mutable.LinkedHashMap.empty).update(t.name, t)
    case CreateTableLike(db, name, srcDb, srcName, ifNotExists) =>
      val src = getTableDef(srcDb, srcName)
        .getOrElse(throw new DdlApplyException(s"no such table: $srcDb.$srcName"))
      val tables = dbs.getOrElseUpdate(db, mutable.LinkedHashMap.empty)
      if (tables.contains(name)) {
        if (!ifNotExists) throw new DdlApplyException(s"table exists: $db.$name")
      } else tables.update(name, src.copy(database = db, name = name))
    case NoOpDdl => ()
  }

  private def placed(cols: Vector[ColumnDef], c: ColumnDef, pos: Placement): Vector[ColumnDef] =
    pos match {
      case Default => cols :+ c
      case First => c +: cols
      case After(ref) =>
        val i = cols.indexWhere(_.name == ref)
        if (i < 0) throw new DdlApplyException(s"no such column: $ref")
        (cols.take(i + 1) :+ c) ++ cols.drop(i + 1)
    }

  private def applyAlter(t: TableDef, spec: AlterSpec): TableDef = spec match {
    case AddColumn(c, pos) =>
      if (t.columnIndex(c.name) >= 0) throw new DdlApplyException(s"duplicate column: ${c.name}")
      t.copy(columns = placed(t.columns, c, pos))
    case DropColumn(name) =>
      val i = t.columnIndex(name)
      if (i < 0) throw new DdlApplyException(s"no such column: $name")
      t.copy(columns = t.columns.patch(i, Nil, 1))
    case ModifyColumn(c, pos) =>
      val i = t.columnIndex(c.name)
      if (i < 0) throw new DdlApplyException(s"no such column: ${c.name}")
      val without = t.columns.patch(i, Nil, 1)
      pos match {
        case Default => t.copy(columns = t.columns.updated(i, c)) // keep position
        case p => t.copy(columns = placed(without, c, p))
      }
    case ChangeColumn(oldName, c, pos) =>
      val i = t.columnIndex(oldName)
      if (i < 0) throw new DdlApplyException(s"no such column: $oldName")
      val without = t.columns.patch(i, Nil, 1)
      pos match {
        case Default => t.copy(columns = t.columns.updated(i, c))
        case p => t.copy(columns = placed(without, c, p))
      }
    case RenameColumn(oldName, newName) =>
      val i = t.columnIndex(oldName)
      if (i < 0) throw new DdlApplyException(s"no such column: $oldName")
      if (t.columnIndex(newName) >= 0)
        throw new DdlApplyException(s"duplicate column: $newName")
      t.copy(columns = t.columns.updated(i, t.columns(i).copy(name = newName)))
    case RenameTo(db, name) =>
      t.copy(database = if (db.isEmpty) t.database else db, name = name)
  }
}

final class DdlParseException(statement: String)
  extends RuntimeException(s"unsupported DDL: $statement")
final class DdlApplyException(msg: String) extends RuntimeException(msg)

// ---------- DDL AST ----------

sealed trait Ddl
final case class CreateDatabase(db: String, ifNotExists: Boolean) extends Ddl
final case class DropDatabase(db: String, ifExists: Boolean) extends Ddl
final case class CreateTable(db: String, name: String, cols: Vector[ColumnDef],
    ifNotExists: Boolean) extends Ddl
final case class DropTable(targets: Vector[(String, String)], ifExists: Boolean) extends Ddl
final case class Truncate(db: String, name: String) extends Ddl
final case class RenameTable(pairs: Vector[((String, String), (String, String))]) extends Ddl
final case class AlterTable(db: String, name: String, specs: Vector[AlterSpec]) extends Ddl
final case class CreateTableLike(db: String, name: String, srcDb: String, srcName: String,
    ifNotExists: Boolean) extends Ddl
/** Recognized DDL with no schema-shape effect (index DDL, ALTER DATABASE,
  * SET DEFAULT, table options): replaying it is a no-op, NOT a parse
  * failure — real binlogs carry these constantly and parking on them
  * (T7) would stall replication for statements that cannot drift the
  * mirror. */
case object NoOpDdl extends Ddl

sealed trait Placement
case object Default extends Placement
case object First extends Placement
final case class After(col: String) extends Placement

sealed trait AlterSpec
final case class AddColumn(col: ColumnDef, pos: Placement) extends AlterSpec
final case class DropColumn(name: String) extends AlterSpec
final case class ModifyColumn(col: ColumnDef, pos: Placement) extends AlterSpec
final case class ChangeColumn(oldName: String, col: ColumnDef, pos: Placement) extends AlterSpec
/** MySQL 8.0 `RENAME COLUMN old TO new` — a shape change (the name), with
  * type/position preserved, unlike CHANGE which restates the full def. */
final case class RenameColumn(oldName: String, newName: String) extends AlterSpec
final case class RenameTo(db: String, name: String) extends AlterSpec

// ---------- tokenizer + recursive-descent parser ----------

object DdlParser {

  /** Tokenize respecting backtick identifiers, quoted strings, parens and
    * commas. Comments are stripped INSIDE the loop, where quote state is
    * known — a regex pre-pass would also delete from a dash-dash or
    * slash-star INSIDE a string literal (e.g. COMMENT 'x -- y'),
    * truncating the statement and silently dropping every later column
    * from the mirror. */
  private[cdc] def tokenize(sql: String): Vector[String] = {
    val s = sql
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch.isWhitespace) i += 1
      else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val j = s.indexOf("*/", i + 2)
        i = if (j < 0) s.length else j + 2
      } else if (ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (ch == '#') {
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (ch == '`') {
        val j = s.indexOf('`', i + 1)
        require(j > 0, "unterminated backtick identifier")
        out += s.substring(i + 1, j)
        i = j + 1
      } else if (ch == '\'' || ch == '"') {
        val sb = new StringBuilder
        var j = i + 1
        var done = false
        while (j < s.length && !done) {
          val c = s.charAt(j)
          if (c == '\\' && j + 1 < s.length) { sb.append(s.charAt(j + 1)); j += 2 }
          else if (c == ch) { done = true; j += 1 }
          else { sb.append(c); j += 1 }
        }
        out += ("'" + sb.toString) // string literal token, marked with leading quote
        i = j
      } else if ("(),.;".indexOf(ch) >= 0) {
        out += ch.toString; i += 1
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace && "(),.;`'\"".indexOf(s.charAt(j)) < 0) j += 1
        out += s.substring(i, j)
        i = j
      }
    }
    out.result()
  }

  def parse(sql: String, currentDb: String): Option[Ddl] =
    try {
      val p = new P(tokenize(sql), currentDb)
      val r = p.statement()
      if (r != null && p.atEndOrSemicolon) Some(r) else None
    } catch { case _: Exception => None }

  private final class P(toks: Vector[String], currentDb: String) {
    private var i = 0
    private def peek: String = if (i < toks.length) toks(i) else ""
    private def peekUp: String = peek.toUpperCase
    private def next(): String = { val t = peek; i += 1; t }
    private def accept(kw: String): Boolean =
      if (peekUp == kw) { i += 1; true } else false
    private def expect(kw: String): Unit =
      require(accept(kw), s"expected $kw got $peek")
    def atEndOrSemicolon: Boolean = i >= toks.length || (peek == ";" && i == toks.length - 1)

    private def ident(): String = {
      val t = next()
      require(t.nonEmpty && t != "(" && t != ")" && t != ",", s"bad identifier: $t")
      t
    }

    /** [db .] name */
    private def qualified(): (String, String) = {
      val a = ident()
      if (peek == ".") { next(); (a, ident()) } else (currentDb, a)
    }

    /** Consume everything up to the terminating semicolon/end — for table
      * options (`ENGINE=`, `DEFAULT CHARSET=`, `COMMENT=`, ...) and other
      * schema-shape-neutral tails. */
    private def skipToEnd(): Unit =
      while (i < toks.length && peek != ";") { if (peek == "(") skipParens() else next() }

    def statement(): Ddl = peekUp match {
      case "CREATE" =>
        next()
        if (accept("DATABASE") || accept("SCHEMA")) {
          val ine = ifNotExists()
          val db = ident()
          skipToEnd() // charset/collation options
          CreateDatabase(db, ine)
        } else if (peekUp == "UNIQUE" || peekUp == "FULLTEXT" || peekUp == "SPATIAL" ||
          peekUp == "INDEX") {
          // CREATE [UNIQUE|FULLTEXT|SPATIAL] INDEX name ON tbl (...): no
          // schema-shape effect
          skipToEnd(); NoOpDdl
        } else {
          accept("TEMPORARY")
          expect("TABLE")
          val ine = ifNotExists()
          val (db, name) = qualified()
          if (accept("LIKE")) {
            val (sdb, sname) = qualified()
            CreateTableLike(db, name, sdb, sname, ine)
          } else if (peek == "(" && toks.lift(i + 1).map(_.toUpperCase).contains("LIKE")) {
            next(); next() // ( LIKE
            val (sdb, sname) = qualified()
            expect(")")
            CreateTableLike(db, name, sdb, sname, ine)
          } else {
            expect("(")
            val cols = columnDefs()
            skipToEnd() // ENGINE= / CHARSET= / COMMENT= table options
            CreateTable(db, name, cols, ine)
          }
        }
      case "DROP" =>
        next()
        if (accept("DATABASE") || accept("SCHEMA")) {
          val ie = ifExists()
          DropDatabase(ident(), ie)
        } else if (peekUp == "INDEX") {
          skipToEnd(); NoOpDdl // DROP INDEX name ON tbl
        } else {
          accept("TEMPORARY")
          expect("TABLE")
          val ie = ifExists()
          val targets = Vector.newBuilder[(String, String)]
          targets += qualified()
          while (accept(",")) targets += qualified()
          DropTable(targets.result(), ie)
        }
      case "TRUNCATE" =>
        next(); accept("TABLE")
        val (db, name) = qualified()
        Truncate(db, name)
      case "RENAME" =>
        next(); expect("TABLE")
        val pairs = Vector.newBuilder[((String, String), (String, String))]
        def onePair(): Unit = {
          val from = qualified()
          require(accept("TO") || accept("AS"), "expected TO")
          pairs += ((from, qualified()))
        }
        onePair()
        while (accept(",")) onePair()
        RenameTable(pairs.result())
      case "ALTER" =>
        next()
        if (peekUp == "DATABASE" || peekUp == "SCHEMA") {
          skipToEnd(); return NoOpDdl // charset/collation only
        }
        expect("TABLE")
        val (db, name) = qualified()
        val specs = Vector.newBuilder[AlterSpec]
        def oneSpec(): Unit = peekUp match {
          case "ADD" =>
            next()
            val hadColumnKw = accept("COLUMN")
            if (!hadColumnKw && peekUp == "PARTITION") {
              skipToEnd() // ADD PARTITION (...): cannot combine with other specs
            } else if (!hadColumnKw && (peekUp == "PRIMARY" || peekUp == "UNIQUE" ||
              peekUp == "INDEX" || peekUp == "KEY" || peekUp == "CONSTRAINT" ||
              peekUp == "FULLTEXT" || peekUp == "SPATIAL" || peekUp == "FOREIGN" ||
              peekUp == "CHECK")) {
              skipSpecTail() // index/constraint DDL: no shape effect
            } else if (peek == "(") {
              // ADD [COLUMN] (a INT, b INT, ...): the multi-column form
              next()
              specs += AddColumn(columnDef(), Default)
              while (accept(",")) specs += AddColumn(columnDef(), Default)
              expect(")")
            } else {
              val c = columnDef()
              specs += AddColumn(c, placement())
            }
          case "DROP" =>
            next()
            if (accept("PRIMARY")) { expect("KEY") }
            else if (accept("INDEX") || accept("KEY")) { ident(); () }
            // DROP FOREIGN KEY fk / CONSTRAINT c / CHECK c: common in real
            // binlogs, no schema-shape effect — skip like the ADD branch does
            // (falling through to DropColumn would park the pipeline on a
            // bogus DropColumn("FOREIGN")).
            else if (accept("FOREIGN")) { expect("KEY"); ident(); () }
            else if (accept("CONSTRAINT") || accept("CHECK")) { ident(); () }
            // DROP PARTITION p0[, p1]: comma-separated name list, and
            // partition ops cannot combine with other specs — consume to end
            else if (accept("PARTITION")) { skipToEnd() }
            else { accept("COLUMN"); specs += DropColumn(ident()) }
          case "MODIFY" =>
            next(); accept("COLUMN")
            val c = columnDef()
            specs += ModifyColumn(c, placement())
          case "CHANGE" =>
            next(); accept("COLUMN")
            val oldName = ident()
            val c = columnDef()
            specs += ChangeColumn(oldName, c, placement())
          case "RENAME" =>
            next()
            if (peekUp == "INDEX" || peekUp == "KEY") { skipSpecTail() } // index rename: no-op
            else if (accept("COLUMN")) {
              // MySQL 8.0 RENAME COLUMN old TO new: shape change, def kept
              val oldName = ident()
              require(accept("TO") || accept("AS"), "expected TO")
              specs += RenameColumn(oldName, ident())
            } else {
              if (!accept("TO")) accept("AS")
              val a = ident()
              // unqualified rename stays in the table's own database
              val (tdb, tname) = if (peek == ".") { next(); (a, ident()) } else ("", a)
              specs += RenameTo(tdb, tname)
            }
          case "ALTER" =>
            // ALTER [COLUMN] x SET DEFAULT v | DROP DEFAULT,
            // ALTER INDEX i VISIBLE, ALTER CHECK c ENFORCED: no shape change
            next(); skipSpecTail()
          case kw if kw == "ENGINE" || kw.startsWith("ENGINE=") ||
            kw == "AUTO_INCREMENT" || kw.startsWith("AUTO_INCREMENT=") ||
            kw == "COMMENT" || kw.startsWith("COMMENT=") ||
            kw == "ROW_FORMAT" || kw.startsWith("ROW_FORMAT=") ||
            kw == "ALGORITHM" || kw.startsWith("ALGORITHM=") ||
            kw == "LOCK" || kw.startsWith("LOCK=") ||
            kw == "DEFAULT" || kw == "CHARACTER" || kw == "CHARSET" ||
            kw.startsWith("CHARSET=") || kw == "COLLATE" || kw.startsWith("COLLATE=") ||
            kw == "CONVERT" || kw == "ORDER" || kw == "FORCE" ||
            kw == "ENABLE" || kw == "DISABLE" =>
            // table options / maintenance specs: recognized, no schema effect
            skipSpecTail()
          case kw if kw == "PARTITION" || kw == "REMOVE" || kw == "TRUNCATE" ||
            kw == "COALESCE" || kw == "REORGANIZE" || kw == "EXCHANGE" ||
            kw == "ANALYZE" || kw == "CHECK" || kw == "OPTIMIZE" ||
            kw == "REBUILD" || kw == "REPAIR" || kw == "DISCARD" ||
            kw == "IMPORT" || kw == "WITH" || kw == "WITHOUT" =>
            // partition maintenance: data moves, the column shape never does
            // (PARTITION BY / REMOVE PARTITIONING / TRUNCATE|COALESCE|
            //  REORGANIZE|EXCHANGE|ANALYZE|CHECK|OPTIMIZE|REBUILD|REPAIR|
            //  DISCARD|IMPORT PARTITION [TABLESPACE] / WITH[OUT] VALIDATION).
            // Name lists are comma-separated at top level (`DROP PARTITION
            // p0, p1`) and MySQL forbids combining partition ops with other
            // alter specs in one statement — so consume to the END, not to
            // the next comma (which would mis-parse `p1` as a spec)
            skipToEnd()
          case other =>
            throw new IllegalArgumentException(s"unsupported alter spec: $other")
        }

        def skipSpecTail(): Unit =
          while (i < toks.length && peek != "," && peek != ";") {
            if (peek == "(") skipParens() else next()
          }
        oneSpec()
        while (accept(",")) oneSpec()
        AlterTable(db, name, specs.result())
      case _ => null
    }

    private def ifNotExists(): Boolean =
      if (accept("IF")) { expect("NOT"); expect("EXISTS"); true } else false
    private def ifExists(): Boolean =
      if (accept("IF")) { expect("EXISTS"); true } else false

    private def placement(): Placement =
      if (accept("FIRST")) First
      else if (accept("AFTER")) After(ident())
      else Default

    /** Consume the rest of a table-level constraint entry: everything up to
      * the entry-separating comma or the list-closing paren at depth 0. */
    private def skipConstraintTail(): Unit = {
      var depth = 0
      var done = false
      while (!done && i < toks.length) {
        val t = peek
        if (t == "(") { depth += 1; next() }
        else if (t == ")") { if (depth == 0) done = true else { depth -= 1; next() } }
        else if (t == "," && depth == 0) done = true
        else next()
      }
    }

    private def skipParens(): Unit = {
      if (peek == "(") {
        next()
        var depth = 1
        while (depth > 0 && i < toks.length) {
          val t = next()
          if (t == "(") depth += 1 else if (t == ")") depth -= 1
        }
      }
    }

    private def columnDefs(): Vector[ColumnDef] = {
      val cols = Vector.newBuilder[ColumnDef]
      var done = false
      while (!done) {
        peekUp match {
          case "PRIMARY" | "UNIQUE" | "KEY" | "INDEX" | "CONSTRAINT" | "FULLTEXT"
              | "FOREIGN" | "SPATIAL" | "CHECK" =>
            // SPATIAL KEY / CHECK (...) are standard SHOW CREATE TABLE
            // output — falling into columnDef would consume the keyword
            // as a column name and abort the whole parse
            val isPrimary = peekUp == "PRIMARY"
            // capture PRIMARY KEY column to mark ColumnDef.key
            while (i < toks.length && peek != "(") next()
            if (isPrimary && peek == "(") {
              next()
              val pkCols = mutable.Buffer.empty[String]
              while (peek != ")") { if (peek != ",") pkCols += next() else next() }
              next() // )
              val built = cols.result()
              cols.clear()
              cols ++= built.map(c =>
                if (pkCols.contains(c.name)) c.copy(key = "PRI", nullable = false) else c)
            } else skipParens()
            // constraint tails past the first paren group — a FOREIGN KEY's
            // `REFERENCES t (c) ON DELETE CASCADE`, a CHECK's `NOT ENFORCED`,
            // an index's `USING BTREE` — would otherwise fall into columnDef
            // on the next loop turn and abort the parse
            skipConstraintTail()
          case _ =>
            cols += columnDef()
        }
        if (accept(",")) ()
        else { expect(")"); done = true }
      }
      cols.result()
    }

    /** name TYPE[(n[,m])] [UNSIGNED] [ZEROFILL] [CHARACTER SET x] [COLLATE x]
      * [NOT NULL | NULL] [DEFAULT v] [AUTO_INCREMENT] [UNIQUE | PRIMARY KEY]
      * [COMMENT 'x'] */
    private def columnDef(): ColumnDef = {
      val name = ident()
      val baseType = next().toUpperCase
      val sb = new StringBuilder(baseType.toLowerCase)
      if (peek == "(") {
        sb.append('(')
        next()
        var first = true
        while (peek != ")") {
          val t = next()
          if (t == ",") sb.append(',')
          else { if (!first && !sb.endsWith(",")) sb.append(','); sb.append(stripQuote(t)); first = false }
        }
        next()
        sb.append(')')
      }
      var unsigned = false
      var nullable = true
      var key = ""
      var charset = ""
      var done = false
      while (!done) {
        peekUp match {
          case "UNSIGNED" => next(); unsigned = true
          case "SIGNED" | "ZEROFILL" | "BINARY" => next()
          case "CHARACTER" => next(); expect("SET"); charset = ident()
          case "CHARSET" => next(); charset = ident()
          case "COLLATE" => next(); ident()
          case "NOT" => next(); expect("NULL"); nullable = false
          case "NULL" => next()
          case "DEFAULT" =>
            next()
            if (peek == "(") skipParens()
            else {
              val v = next()
              if (v == ".") next() // leading-dot decimal: DEFAULT .5
              else if (peek == "(") skipParens() // e.g. CURRENT_TIMESTAMP(3)
              // decimal literals: '.' is a tokenizer punct, so DEFAULT 0.00
              // arrives as "0" "." "00" — stitch the fraction back on
              while (peek == ".") { next(); next() }
            }
          case "ON" => next(); expect("UPDATE"); next(); if (peek == "(") skipParens()
          case "AUTO_INCREMENT" => next()
          case "UNIQUE" => next(); accept("KEY"); if (key.isEmpty) key = "UNI"
          case "PRIMARY" => next(); expect("KEY"); key = "PRI"; nullable = false
          case "KEY" => next(); if (key.isEmpty) key = "MUL"
          case "COMMENT" => next(); next()
          // generated columns: [GENERATED ALWAYS] AS (expr) [VIRTUAL|STORED].
          // The expression is opaque to the mirror — only the column's
          // name/type/order matter for rows decode (virtual columns are
          // absent from ROW images; stored ones present like any other).
          case "GENERATED" => next(); expect("ALWAYS"); expect("AS"); skipParens()
          case "AS" => next(); skipParens()
          case "VIRTUAL" | "STORED" => next()
          // column CHECK (expr) [[NOT] ENFORCED] — lookahead before eating
          // NOT: `CHECK (c > 0) NOT NULL` continues with column attributes
          case "CHECK" =>
            next(); skipParens()
            if (peekUp == "NOT" && toks.lift(i + 1).exists(_.equalsIgnoreCase("ENFORCED"))) {
              next(); next()
            } else { accept("ENFORCED"); () }
          case "INVISIBLE" | "VISIBLE" => next() // 8.0 invisible columns
          case "SRID" => next(); next()
          case "COLUMN_FORMAT" | "STORAGE" => next(); next()
          // inline FK: REFERENCES tbl (cols) [MATCH ...] [ON DELETE|UPDATE action]
          case "REFERENCES" =>
            next(); qualified()
            if (peek == "(") skipParens()
            val fkTail = Set("MATCH", "FULL", "PARTIAL", "SIMPLE", "ON",
              "DELETE", "UPDATE", "RESTRICT", "CASCADE", "SET", "NULL",
              "NO", "ACTION")
            while (fkTail(peekUp)) next()
          case _ => done = true
        }
      }
      val inner = innerTypeOf(baseType)
      if (unsigned) sb.append(" unsigned")
      ColumnDef(name, sb.toString, inner, key, charset, unsigned, nullable)
    }

    private def stripQuote(t: String): String =
      if (t.startsWith("'")) "'" + t.drop(1) + "'" else t
  }

  private def innerTypeOf(baseType: String): Int = {
    import InnerType._
    baseType match {
      case "TINYINT" | "BOOL" | "BOOLEAN" => TINY
      case "SMALLINT" => SHORT
      case "MEDIUMINT" => INT24
      case "INT" | "INTEGER" => LONG
      case "BIGINT" => LONGLONG
      case "DECIMAL" | "NUMERIC" | "DEC" | "FIXED" => NEWDECIMAL
      case "FLOAT" => FLOAT
      case "DOUBLE" | "REAL" => DOUBLE
      case "BIT" => BIT
      case "DATE" => DATE
      case "TIME" => TIME
      case "DATETIME" => DATETIME
      case "TIMESTAMP" => TIMESTAMP
      case "YEAR" => YEAR
      case "CHAR" => STRING
      case "VARCHAR" => VARCHAR
      case "TINYTEXT" | "TINYBLOB" => TINY_BLOB
      case "MEDIUMTEXT" | "MEDIUMBLOB" => MEDIUM_BLOB
      case "LONGTEXT" | "LONGBLOB" => LONG_BLOB
      case "TEXT" | "BLOB" | "VARBINARY" => BLOB
      case "ENUM" => ENUM
      case "SET" => SET
      case "JSON" => JSON
      case "GEOMETRY" | "POINT" | "LINESTRING" | "POLYGON" => GEOMETRY
      case _ => VARCHAR
    }
  }
}
