package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven corpus of real-world DDL shapes — the statements a
  * production MySQL 5.7/8.0 binlog actually carries (the dialect the
  * reference outsources to ddl-executor's TiDB parser,
  * /root/reference/schema/tracker.go:61-70). Every case replays against a
  * fresh mirror and asserts the resulting catalog; the final group proves
  * genuinely unknown statements still park cleanly (T7) instead of
  * corrupting the mirror.
  */
class DdlCorpusSpec extends AnyFunSuite {

  private val base =
    "CREATE TABLE t (id INT NOT NULL PRIMARY KEY, a INT, b VARCHAR(10))"

  private def fresh(stmts: String*): SchemaTracker = {
    val tr = new SchemaTracker
    tr.createDatabase("db")
    stmts.foreach(tr.execDdl(_, "db"))
    tr
  }

  private def cols(tr: SchemaTracker, table: String = "t"): Vector[String] =
    tr.getTableDef("db", table).getOrElse(
      throw new AssertionError(s"no table db.$table")).columns.map(_.name)

  /** (label, ALTER/DDL statements after the base table, expected columns) */
  private val shapeCases: Seq[(String, Seq[String], Vector[String])] = Seq(
    // ---- column add/drop/modify/change, all placements ----
    ("add", Seq("ALTER TABLE t ADD COLUMN c INT"), Vector("id", "a", "b", "c")),
    ("add bare", Seq("ALTER TABLE t ADD c BIGINT"), Vector("id", "a", "b", "c")),
    ("add first", Seq("ALTER TABLE t ADD COLUMN c INT FIRST"), Vector("c", "id", "a", "b")),
    ("add after", Seq("ALTER TABLE t ADD COLUMN c INT AFTER a"), Vector("id", "a", "c", "b")),
    ("add multi-paren", Seq("ALTER TABLE t ADD COLUMN (c INT, d BIGINT UNSIGNED)"),
      Vector("id", "a", "b", "c", "d")),
    ("add multi-paren bare", Seq("ALTER TABLE t ADD (c INT, d TEXT)"),
      Vector("id", "a", "b", "c", "d")),
    ("drop", Seq("ALTER TABLE t DROP COLUMN a"), Vector("id", "b")),
    ("drop bare", Seq("ALTER TABLE t DROP a"), Vector("id", "b")),
    ("modify keeps position", Seq("ALTER TABLE t MODIFY COLUMN a BIGINT NOT NULL"),
      Vector("id", "a", "b")),
    ("modify moves", Seq("ALTER TABLE t MODIFY a INT UNSIGNED AFTER b"),
      Vector("id", "b", "a")),
    ("change renames", Seq("ALTER TABLE t CHANGE COLUMN a a2 INT"),
      Vector("id", "a2", "b")),
    ("change moves first", Seq("ALTER TABLE t CHANGE a a2 BIGINT FIRST"),
      Vector("a2", "id", "b")),
    ("rename column", Seq("ALTER TABLE t RENAME COLUMN a TO a_new"),
      Vector("id", "a_new", "b")),
    ("rename column as", Seq("ALTER TABLE t RENAME COLUMN b AS b2"),
      Vector("id", "a", "b2")),
    // ---- multi-alter statements ----
    ("multi add+drop+modify",
      Seq("ALTER TABLE t ADD COLUMN c TEXT, DROP COLUMN a, MODIFY b VARCHAR(20)"),
      Vector("id", "b", "c")),
    ("multi with placements",
      Seq("ALTER TABLE t ADD c INT FIRST, ADD d INT AFTER a, RENAME COLUMN b TO e"),
      Vector("c", "id", "a", "d", "e")),
    ("multi rename chain",
      Seq("ALTER TABLE t RENAME COLUMN a TO x, RENAME COLUMN x TO y"),
      Vector("id", "y", "b")),
    // ---- ALGORITHM / LOCK riders (inplace DDL) ----
    ("algorithm inplace",
      Seq("ALTER TABLE t ADD COLUMN c INT, ALGORITHM=INPLACE, LOCK=NONE"),
      Vector("id", "a", "b", "c")),
    ("algorithm spaced",
      Seq("ALTER TABLE t DROP COLUMN a, ALGORITHM = COPY, LOCK = SHARED"),
      Vector("id", "b")),
    ("algorithm instant",
      Seq("ALTER TABLE t ADD COLUMN c JSON, ALGORITHM=INSTANT"),
      Vector("id", "a", "b", "c")),
    ("algorithm first spec",
      Seq("ALTER TABLE t ALGORITHM=INPLACE, ADD COLUMN c INT"),
      Vector("id", "a", "b", "c")),
    // ---- generated / virtual columns ----
    ("generated virtual",
      Seq("ALTER TABLE t ADD COLUMN g INT AS (a + 1) VIRTUAL"),
      Vector("id", "a", "b", "g")),
    ("generated stored",
      Seq("ALTER TABLE t ADD COLUMN g BIGINT GENERATED ALWAYS AS (a * 2) STORED NOT NULL"),
      Vector("id", "a", "b", "g")),
    ("generated expr with commas+parens",
      Seq("ALTER TABLE t ADD COLUMN g VARCHAR(30) AS (CONCAT(b, '-', id)) VIRTUAL AFTER id"),
      Vector("id", "g", "a", "b")),
    ("modify to generated",
      Seq("ALTER TABLE t MODIFY COLUMN a INT AS (id + 10) STORED"),
      Vector("id", "a", "b")),
    // ---- CHECK constraints ----
    ("add named check",
      Seq("ALTER TABLE t ADD CONSTRAINT chk_a CHECK (a > 0)"),
      Vector("id", "a", "b")),
    ("add anonymous check",
      Seq("ALTER TABLE t ADD CHECK (a <> 0)"),
      Vector("id", "a", "b")),
    ("add check not enforced",
      Seq("ALTER TABLE t ADD CONSTRAINT chk CHECK (a > 0) NOT ENFORCED"),
      Vector("id", "a", "b")),
    ("drop check",
      Seq("ALTER TABLE t ADD CONSTRAINT chk CHECK (a > 0)",
        "ALTER TABLE t DROP CHECK chk"),
      Vector("id", "a", "b")),
    ("alter check enforcement",
      Seq("ALTER TABLE t ADD CONSTRAINT chk CHECK (a > 0)",
        "ALTER TABLE t ALTER CHECK chk NOT ENFORCED"),
      Vector("id", "a", "b")),
    ("drop constraint",
      Seq("ALTER TABLE t ADD CONSTRAINT chk CHECK (a > 0)",
        "ALTER TABLE t DROP CONSTRAINT chk"),
      Vector("id", "a", "b")),
    ("column check inline",
      Seq("ALTER TABLE t ADD COLUMN c INT CHECK (c > 0) NOT NULL"),
      Vector("id", "a", "b", "c")),
    // ---- foreign keys ----
    ("add fk with actions",
      Seq("ALTER TABLE t ADD CONSTRAINT fk_a FOREIGN KEY (a) REFERENCES parent (id) ON DELETE CASCADE ON UPDATE RESTRICT"),
      Vector("id", "a", "b")),
    ("drop fk",
      Seq("ALTER TABLE t ADD CONSTRAINT fk_a FOREIGN KEY (a) REFERENCES parent (id)",
        "ALTER TABLE t DROP FOREIGN KEY fk_a"),
      Vector("id", "a", "b")),
    ("fk set null",
      Seq("ALTER TABLE t ADD FOREIGN KEY (a) REFERENCES parent (id) ON DELETE SET NULL"),
      Vector("id", "a", "b")),
    ("inline references",
      Seq("ALTER TABLE t ADD COLUMN c INT REFERENCES parent (id) ON DELETE CASCADE"),
      Vector("id", "a", "b", "c")),
    // ---- index DDL (shape-neutral) ----
    ("add index", Seq("ALTER TABLE t ADD INDEX idx_a (a)"), Vector("id", "a", "b")),
    ("add unique", Seq("ALTER TABLE t ADD UNIQUE KEY uq_b (b)"), Vector("id", "a", "b")),
    ("add fulltext", Seq("ALTER TABLE t ADD FULLTEXT INDEX ft_b (b)"), Vector("id", "a", "b")),
    ("add spatial", Seq("ALTER TABLE t ADD COLUMN g GEOMETRY NOT NULL",
      "ALTER TABLE t ADD SPATIAL INDEX sp_g (g)"), Vector("id", "a", "b", "g")),
    ("drop index", Seq("ALTER TABLE t ADD INDEX idx_a (a)",
      "ALTER TABLE t DROP INDEX idx_a"), Vector("id", "a", "b")),
    ("rename index", Seq("ALTER TABLE t ADD INDEX idx_a (a)",
      "ALTER TABLE t RENAME INDEX idx_a TO idx_a2"), Vector("id", "a", "b")),
    ("alter index visibility", Seq("ALTER TABLE t ADD INDEX idx_a (a)",
      "ALTER TABLE t ALTER INDEX idx_a INVISIBLE"), Vector("id", "a", "b")),
    ("add index using btree",
      Seq("ALTER TABLE t ADD INDEX idx_a (a) USING BTREE COMMENT 'hot'"),
      Vector("id", "a", "b")),
    // ---- partition DDL (data moves; columns never) ----
    ("partition by range",
      Seq("ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN MAXVALUE)"),
      Vector("id", "a", "b")),
    ("partition by hash", Seq("ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 4"),
      Vector("id", "a", "b")),
    ("partition by key", Seq("ALTER TABLE t PARTITION BY KEY (id) PARTITIONS 8"),
      Vector("id", "a", "b")),
    ("partition by list columns",
      Seq("ALTER TABLE t PARTITION BY LIST COLUMNS (b) (PARTITION pa VALUES IN ('x','y'), PARTITION pb VALUES IN ('z'))"),
      Vector("id", "a", "b")),
    ("add partition",
      Seq("ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10))",
        "ALTER TABLE t ADD PARTITION (PARTITION p1 VALUES LESS THAN (20))"),
      Vector("id", "a", "b")),
    ("drop partition",
      Seq("ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN (20))",
        "ALTER TABLE t DROP PARTITION p0"),
      Vector("id", "a", "b")),
    ("truncate partition", Seq(
      "ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 2",
      "ALTER TABLE t TRUNCATE PARTITION p0"), Vector("id", "a", "b")),
    ("coalesce partition", Seq(
      "ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 4",
      "ALTER TABLE t COALESCE PARTITION 2"), Vector("id", "a", "b")),
    ("reorganize partition", Seq(
      "ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN MAXVALUE)",
      "ALTER TABLE t REORGANIZE PARTITION p1 INTO (PARTITION p1a VALUES LESS THAN (20), PARTITION p1b VALUES LESS THAN MAXVALUE)"),
      Vector("id", "a", "b")),
    ("exchange partition", Seq(
      "CREATE TABLE t2 (id INT NOT NULL PRIMARY KEY, a INT, b VARCHAR(10))",
      "ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10))",
      "ALTER TABLE t EXCHANGE PARTITION p0 WITH TABLE t2 WITH VALIDATION"),
      Vector("id", "a", "b")),
    ("remove partitioning", Seq(
      "ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 2",
      "ALTER TABLE t REMOVE PARTITIONING"), Vector("id", "a", "b")),
    ("drop partition multi-name",
      Seq("ALTER TABLE t PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (10), PARTITION p1 VALUES LESS THAN (20), PARTITION p2 VALUES LESS THAN MAXVALUE)",
        "ALTER TABLE t DROP PARTITION p0, p1"),
      Vector("id", "a", "b")),
    ("truncate/analyze partition multi-name", Seq(
      "ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 4",
      "ALTER TABLE t TRUNCATE PARTITION p0, p1",
      "ALTER TABLE t ANALYZE PARTITION p0, p1, p2",
      "ALTER TABLE t REPAIR PARTITION p2, p3"), Vector("id", "a", "b")),
    ("leading-dot decimal default",
      Seq("ALTER TABLE t ADD COLUMN r DOUBLE DEFAULT .5",
        "ALTER TABLE t ADD COLUMN r2 FLOAT DEFAULT .25 AFTER a"),
      Vector("id", "a", "r2", "b", "r")),
    ("partition maintenance", Seq(
      "ALTER TABLE t PARTITION BY HASH (id) PARTITIONS 2",
      "ALTER TABLE t ANALYZE PARTITION p0",
      "ALTER TABLE t CHECK PARTITION ALL",
      "ALTER TABLE t OPTIMIZE PARTITION p0",
      "ALTER TABLE t REBUILD PARTITION p1",
      "ALTER TABLE t REPAIR PARTITION ALL"), Vector("id", "a", "b")),
    // ---- table options / maintenance ----
    ("engine+auto_increment",
      Seq("ALTER TABLE t ENGINE=InnoDB, AUTO_INCREMENT=1000"), Vector("id", "a", "b")),
    ("comment+row_format",
      Seq("ALTER TABLE t COMMENT='orders mirror', ROW_FORMAT=DYNAMIC"),
      Vector("id", "a", "b")),
    ("convert charset",
      Seq("ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_general_ci"),
      Vector("id", "a", "b")),
    ("default charset",
      Seq("ALTER TABLE t DEFAULT CHARACTER SET utf8mb4"), Vector("id", "a", "b")),
    ("order by + force",
      Seq("ALTER TABLE t ORDER BY id", "ALTER TABLE t FORCE"), Vector("id", "a", "b")),
    ("enable/disable keys",
      Seq("ALTER TABLE t DISABLE KEYS", "ALTER TABLE t ENABLE KEYS"),
      Vector("id", "a", "b")),
    ("set default / drop default",
      Seq("ALTER TABLE t ALTER COLUMN a SET DEFAULT 5",
        "ALTER TABLE t ALTER COLUMN a DROP DEFAULT",
        "ALTER TABLE t ALTER b SET DEFAULT ('x')"), Vector("id", "a", "b")),
    ("tablespace", Seq("ALTER TABLE t DISCARD TABLESPACE",
      "ALTER TABLE t IMPORT TABLESPACE"), Vector("id", "a", "b")),
    // ---- 8.0 column attributes ----
    ("invisible column",
      Seq("ALTER TABLE t ADD COLUMN h INT INVISIBLE"), Vector("id", "a", "b", "h")),
    ("visible again",
      Seq("ALTER TABLE t ADD COLUMN h INT INVISIBLE",
        "ALTER TABLE t MODIFY COLUMN h INT VISIBLE"), Vector("id", "a", "b", "h")),
    ("srid attribute",
      Seq("ALTER TABLE t ADD COLUMN geo POINT SRID 4326"), Vector("id", "a", "b", "geo")),
    ("column_format + storage",
      Seq("ALTER TABLE t ADD COLUMN cf INT COLUMN_FORMAT FIXED STORAGE MEMORY"),
      Vector("id", "a", "b", "cf")),
    ("defaults: expression + on update",
      Seq("ALTER TABLE t ADD COLUMN ts TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP",
        "ALTER TABLE t ADD COLUMN u VARCHAR(36) DEFAULT (UUID())"),
      Vector("id", "a", "b", "ts", "u")),
  )

  shapeCases.foreach { case (label, stmts, expected) =>
    test(s"corpus: $label") {
      val tr = fresh(base +: stmts: _*)
      assert(cols(tr) == expected)
    }
  }

  test("corpus: attributes land in the mirrored defs, not just the names") {
    val tr = fresh(base,
      "ALTER TABLE t MODIFY COLUMN a BIGINT UNSIGNED NOT NULL",
      "ALTER TABLE t ADD COLUMN g INT GENERATED ALWAYS AS (a * 2) STORED NOT NULL",
      "ALTER TABLE t RENAME COLUMN b TO label")
    val d = tr.getTableDef("db", "t").get
    val a = d.columns(d.columnIndex("a"))
    assert(a.sqlType == "bigint unsigned" && a.unsigned && !a.nullable)
    assert(d.columns(d.columnIndex("g")).sqlType == "int")
    assert(!d.columns(d.columnIndex("g")).nullable)
    val l = d.columns(d.columnIndex("label"))
    assert(l.sqlType == "varchar(10)") // rename preserved the def
    assert(d.columns(d.columnIndex("id")).key == "PRI")
  }

  test("corpus: CREATE TABLE with generated columns, checks, and FKs") {
    val tr = fresh(
      """CREATE TABLE orders (
        |  id BIGINT UNSIGNED NOT NULL AUTO_INCREMENT,
        |  customer_id BIGINT NOT NULL,
        |  total DECIMAL(12,2) NOT NULL DEFAULT 0.00 CHECK (total >= 0),
        |  total_cents BIGINT AS (total * 100) STORED,
        |  note VARCHAR(255) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin,
        |  created TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP,
        |  PRIMARY KEY (id),
        |  UNIQUE KEY uq_note (note),
        |  CONSTRAINT chk_total CHECK (total < 1000000) NOT ENFORCED,
        |  CONSTRAINT fk_cust FOREIGN KEY (customer_id) REFERENCES customers (id) ON DELETE CASCADE ON UPDATE NO ACTION,
        |  INDEX idx_created (created) USING BTREE
        |) ENGINE=InnoDB AUTO_INCREMENT=7 DEFAULT CHARSET=utf8mb4
        |  PARTITION BY RANGE (id) (PARTITION p0 VALUES LESS THAN (1000), PARTITION p1 VALUES LESS THAN MAXVALUE)""".stripMargin)
    val d = tr.getTableDef("db", "orders").get
    assert(d.columns.map(_.name) ==
      Vector("id", "customer_id", "total", "total_cents", "note", "created"))
    assert(d.columns.head.key == "PRI" && d.columns.head.unsigned)
    assert(d.columns(d.columnIndex("note")).charset == "utf8mb4")
  }

  test("corpus: a 5.7-era production migration replays end-to-end") {
    val tr = fresh(
      "CREATE TABLE users (id INT NOT NULL AUTO_INCREMENT, email VARCHAR(191) NOT NULL, PRIMARY KEY (id), UNIQUE KEY uq_email (email)) ENGINE=InnoDB DEFAULT CHARSET=utf8",
      "ALTER TABLE users ADD COLUMN created_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP, ADD COLUMN updated_at TIMESTAMP NULL DEFAULT NULL, ALGORITHM=INPLACE, LOCK=NONE",
      "ALTER TABLE users ADD COLUMN status TINYINT NOT NULL DEFAULT 0 AFTER email",
      "ALTER TABLE users CHANGE COLUMN status state TINYINT UNSIGNED NOT NULL DEFAULT 0",
      "ALTER TABLE users ADD INDEX idx_state (state), ALGORITHM=INPLACE",
      "ALTER TABLE users CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_unicode_ci",
      "ALTER TABLE users RENAME COLUMN email TO email_address",
      "ALTER TABLE users DROP INDEX uq_email, ADD UNIQUE KEY uq_email (email_address)")
    assert(cols(tr, "users") ==
      Vector("id", "email_address", "state", "created_at", "updated_at"))
    val st = tr.getTableDef("db", "users").get
    assert(st.columns(st.columnIndex("state")).unsigned)
  }

  test("corpus: genuinely unknown statements still park (T7), mirror intact") {
    val tr = fresh(base)
    val park = Seq(
      "ALTER TABLE t FROBNICATE COLUMN a",        // nonsense spec
      "CREATE TABLE t3 AS SELECT * FROM t",       // shape not derivable
      "ALTER VIEW v AS SELECT 1",                  // not a table DDL
      "ALTER TABLE t SPLIT PARTITION p0 INTO (x)") // non-MySQL dialect
    park.foreach { stmt =>
      intercept[DdlParseException] { tr.execDdl(stmt, "db") }
    }
    // the failed statements touched nothing
    assert(cols(tr) == Vector("id", "a", "b"))
    // and apply-time failures (parse OK, semantic error) also leave the
    // mirror usable: dropping a missing column raises DdlApplyException
    intercept[DdlApplyException] { tr.execDdl("ALTER TABLE t DROP COLUMN zz", "db") }
    assert(cols(tr) == Vector("id", "a", "b"))
  }
}
