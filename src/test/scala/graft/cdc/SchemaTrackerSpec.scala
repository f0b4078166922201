package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DDL-replay scenarios, incl. the reference integration test's mid-stream
  * ALTER (/root/reference/canal/canal_test.go:73-130) and the snapshot
  * restore-as-of-position semantics (/root/reference/schema/tracker.go:54-72). */
class SchemaTrackerSpec extends AnyFunSuite {

  private def freshTracker: SchemaTracker = {
    val t = new SchemaTracker
    t.execDdl("CREATE DATABASE test", "")
    t.execDdl(
      """CREATE TABLE test.canal_test (
        |  id int AUTO_INCREMENT,
        |  content blob DEFAULT NULL,
        |  name varchar(100),
        |  PRIMARY KEY(id)
        |) ENGINE=innodb""".stripMargin.replaceAll("ENGINE=innodb", ""), "test")
    t
  }

  test("create table: columns, types, primary key") {
    val t = freshTracker
    val d = t.getTableDef("test", "canal_test").get
    assert(d.columns.map(_.name) == Vector("id", "content", "name"))
    assert(d.columns(0).innerType == InnerType.LONG)
    assert(d.columns(0).key == "PRI")
    assert(!d.columns(0).nullable)
    assert(d.columns(1).innerType == InnerType.BLOB)
    assert(d.columns(2).innerType == InnerType.VARCHAR)
    assert(d.columns(2).sqlType == "varchar(100)")
  }

  test("the reference's mid-stream ALTER ADD AFTER (canal_test.go:129)") {
    val t = freshTracker
    t.execDdl("ALTER TABLE test.canal_test ADD `age` INT(5) NOT NULL AFTER `name`", "test")
    val d = t.getTableDef("test", "canal_test").get
    assert(d.columns.map(_.name) == Vector("id", "content", "name", "age"))
    assert(!d.columns(3).nullable)
    assert(d.columns(3).innerType == InnerType.LONG)
  }

  test("alter add FIRST / drop / modify / change") {
    val t = freshTracker
    t.execDdl("ALTER TABLE canal_test ADD flag tinyint(1) unsigned FIRST", "test")
    assert(t.getTableDef("test", "canal_test").get.columns.head.name == "flag")
    assert(t.getTableDef("test", "canal_test").get.columns.head.unsigned)

    t.execDdl("ALTER TABLE canal_test MODIFY name text", "test")
    val afterModify = t.getTableDef("test", "canal_test").get
    assert(afterModify.columns.map(_.name) == Vector("flag", "id", "content", "name"))
    assert(afterModify.columns(3).innerType == InnerType.BLOB)

    t.execDdl("ALTER TABLE canal_test CHANGE content payload longblob", "test")
    assert(t.getTableDef("test", "canal_test").get.columns(2).name == "payload")
    assert(t.getTableDef("test", "canal_test").get.columns(2).innerType == InnerType.LONG_BLOB)

    t.execDdl("ALTER TABLE canal_test DROP COLUMN flag", "test")
    assert(t.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "payload", "name"))
  }

  test("multi-spec alter in one statement") {
    val t = freshTracker
    t.execDdl("ALTER TABLE canal_test ADD a int, ADD b varchar(10), DROP content", "test")
    assert(t.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "name", "a", "b"))
  }

  test("rename table (both syntaxes) and drop/truncate") {
    val t = freshTracker
    t.execDdl("RENAME TABLE test.canal_test TO test.renamed", "")
    assert(t.getTableDef("test", "canal_test").isEmpty)
    assert(t.getTableDef("test", "renamed").isDefined)

    t.execDdl("ALTER TABLE renamed RENAME TO canal_test", "test")
    assert(t.getTableDef("test", "canal_test").isDefined)

    t.execDdl("TRUNCATE TABLE canal_test", "test") // schema unchanged
    assert(t.getTableDef("test", "canal_test").get.columns.size == 3)

    t.execDdl("DROP TABLE IF EXISTS test.canal_test", "")
    assert(t.getTableDef("test", "canal_test").isEmpty)
    t.execDdl("DROP TABLE IF EXISTS test.canal_test", "") // idempotent with IF EXISTS
  }

  test("database ddl + listings") {
    val t = freshTracker
    t.execDdl("CREATE DATABASE IF NOT EXISTS test", "")
    t.execDdl("CREATE DATABASE other", "")
    assert(t.getDatabases == Vector("test", "other"))
    assert(t.getTables("test") == Vector("canal_test"))
    t.execDdl("DROP DATABASE other", "")
    assert(t.getDatabases == Vector("test"))
  }

  test("unsupported DDL throws DdlParseException (parks for repair, T7)") {
    val t = freshTracker
    assertThrows[DdlParseException](
      t.execDdl("CREATE TRIGGER trg BEFORE INSERT ON t FOR EACH ROW SET @x=1", "test"))
    // DML is not DDL
    assert(!t.isDdl("INSERT INTO t VALUES (1)"))
    assert(t.isDdl("ALTER TABLE t ADD c INT"))
  }

  test("comment-laden and quoted DDL parses") {
    val t = freshTracker
    t.execDdl("/*hint*/ ALTER TABLE `canal_test` ADD /*com\nment*/ `x` varchar(10) -- trailing\n", "test")
    assert(t.getTableDef("test", "canal_test").get.columns.map(_.name).contains("x"))
  }

  test("comment markers INSIDE string literals do not truncate the statement") {
    val t = freshTracker
    // the -- lives inside the COMMENT literal: a regex strip would delete
    // ", ADD c2 INT" plus the closing quote and silently lose c2
    t.execDdl("ALTER TABLE canal_test ADD c1 INT COMMENT 'x -- y', ADD c2 INT", "test")
    val cols = t.getTableDef("test", "canal_test").get.columns.map(_.name)
    assert(cols.contains("c1") && cols.contains("c2"))
    t.execDdl("ALTER TABLE canal_test ADD c3 INT COMMENT 'a /* b', ADD c4 INT", "test")
    val cols2 = t.getTableDef("test", "canal_test").get.columns.map(_.name)
    assert(cols2.contains("c3") && cols2.contains("c4"))
  }

  test("inline SPATIAL KEY and CHECK constraints parse (SHOW CREATE TABLE form)") {
    val t = freshTracker
    t.execDdl(
      """CREATE TABLE geo (
        |  id INT NOT NULL,
        |  g GEOMETRY NOT NULL,
        |  price INT,
        |  SPATIAL KEY `g` (`g`),
        |  CHECK (price > 0),
        |  PRIMARY KEY (id)
        |)""".stripMargin, "test")
    val d = t.getTableDef("test", "geo").get
    assert(d.columns.map(_.name) == Vector("id", "g", "price"))
    assert(d.columns.find(_.name == "id").get.key == "PRI")
  }

  test("full type-coverage table (FIXTURES.md §1.4)") {
    val t = new SchemaTracker
    t.execDdl("CREATE DATABASE test", "")
    t.execDdl(
      """CREATE TABLE test.all_types (
        |  c_tiny TINYINT, c_utiny TINYINT UNSIGNED, c_short SMALLINT,
        |  c_int24 MEDIUMINT, c_long INT, c_ulong INT UNSIGNED,
        |  c_longlong BIGINT, c_ulonglong BIGINT UNSIGNED,
        |  c_dec DECIMAL(18,4), c_float FLOAT, c_double DOUBLE,
        |  c_date DATE, c_time TIME, c_dt DATETIME(3), c_ts TIMESTAMP(3),
        |  c_year YEAR, c_bit BIT(8), c_char CHAR(8), c_vc VARCHAR(64),
        |  c_blob BLOB, c_text TEXT, c_enum ENUM('a','b'), c_set SET('x','y'),
        |  c_json JSON, c_null INT,
        |  PRIMARY KEY (c_long)
        |)""".stripMargin, "")
    val d = t.getTableDef("test", "all_types").get
    assert(d.columns.size == 25)
    import org.apache.spark.sql.types._
    val struct = TypeMapper.toStruct(d)
    def tpe(n: String) = struct(n).dataType
    assert(tpe("c_tiny") == ByteType)
    assert(tpe("c_utiny") == ShortType) // unsigned widens
    assert(tpe("c_short") == ShortType)
    assert(tpe("c_int24") == IntegerType)
    assert(tpe("c_long") == IntegerType)
    assert(tpe("c_ulong") == LongType)
    assert(tpe("c_longlong") == LongType)
    assert(tpe("c_ulonglong") == DecimalType(20, 0))
    assert(tpe("c_dec") == DecimalType(18, 4))
    assert(tpe("c_float") == FloatType)
    assert(tpe("c_double") == DoubleType)
    assert(tpe("c_date") == DateType)
    assert(tpe("c_dt") == TimestampType)
    assert(tpe("c_ts") == TimestampType)
    assert(tpe("c_year") == ShortType)
    assert(tpe("c_bit") == BinaryType)
    assert(tpe("c_char") == StringType)
    assert(tpe("c_vc") == StringType)
    assert(tpe("c_blob") == BinaryType)
    assert(tpe("c_enum") == StringType)
    assert(tpe("c_json") == StringType)
    assert(!struct("c_long").nullable) // PK not null
    assert(struct("c_ulong").metadata.getBoolean("unsigned"))
  }

  test("real-world DDL dialect: table options, index DDL, LIKE, no-op alters") {
    val t = freshTracker
    // trailing table options no longer need stripping
    t.execDdl(
      """CREATE TABLE test.opts (
        |  id int NOT NULL,
        |  PRIMARY KEY (id)
        |) ENGINE=InnoDB AUTO_INCREMENT=17 DEFAULT CHARSET=utf8mb4 COMMENT='x'""".stripMargin,
      "test")
    assert(t.getTableDef("test", "opts").get.columns.map(_.name) == Vector("id"))
    // index DDL is recognized but schema-shape neutral
    t.execDdl("CREATE INDEX idx_name ON test.opts (id)", "test")
    t.execDdl("CREATE UNIQUE INDEX u_name ON opts (id)", "test")
    t.execDdl("DROP INDEX idx_name ON test.opts", "test")
    t.execDdl("ALTER TABLE opts ADD INDEX i2 (id), ADD KEY i3 (id) USING BTREE", "test")
    t.execDdl("ALTER TABLE opts RENAME INDEX i2 TO i2x", "test")
    // DROP FOREIGN KEY / CONSTRAINT / CHECK: schema-shape neutral, must NOT
    // park as DropColumn("FOREIGN") — common in real binlogs
    t.execDdl("ALTER TABLE opts DROP FOREIGN KEY fk_other", "test")
    t.execDdl("ALTER TABLE opts DROP CONSTRAINT chk_1", "test")
    t.execDdl("ALTER TABLE opts DROP CHECK chk_2", "test")
    assert(t.getTableDef("test", "opts").get.columns.map(_.name) == Vector("id"))
    // ALTER COLUMN default / table options / charset conversions: no-ops
    t.execDdl("ALTER TABLE opts ALTER COLUMN id SET DEFAULT 5", "test")
    t.execDdl("ALTER TABLE opts ALTER id DROP DEFAULT", "test")
    t.execDdl("ALTER TABLE opts ENGINE=InnoDB, AUTO_INCREMENT = 100", "test")
    t.execDdl("ALTER TABLE opts CONVERT TO CHARACTER SET utf8mb4 COLLATE utf8mb4_bin", "test")
    t.execDdl("ALTER DATABASE test DEFAULT CHARACTER SET utf8mb4", "")
    assert(t.getTableDef("test", "opts").get.columns.map(_.name) == Vector("id"))
    // no-op alters mixed with real ones still apply the real ones
    t.execDdl("ALTER TABLE opts ADD COLUMN v varchar(10), ENGINE=InnoDB, ADD INDEX vi (v)", "test")
    assert(t.getTableDef("test", "opts").get.columns.map(_.name) == Vector("id", "v"))
    // CREATE TABLE ... LIKE copies the shape
    t.execDdl("CREATE TABLE test.opts2 LIKE test.opts", "test")
    assert(t.getTableDef("test", "opts2").get.columns.map(_.name) == Vector("id", "v"))
    t.execDdl("CREATE TABLE opts3 (LIKE opts2)", "test")
    assert(t.getTableDef("test", "opts3").get.columns.map(_.name) == Vector("id", "v"))
  }

  test("snapshot save/restore as-of position") {
    val dir = Files.createTempDirectory("snapstore")
    val store = new SchemaSnapshotStore(dir)
    val t = freshTracker

    store.save(Position("mysql-bin.000001", 1000, 7), t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.save(Position("mysql-bin.000001", 2000, 7), t.getDatabases, t.snapshotCatalog)

    // resume at 1500 → schema as of 1000 (without age)
    val (pos, dbs, defs) = store.load(Position("mysql-bin.000001", 1500, 7)).get
    assert(pos == Position("mysql-bin.000001", 1000, 7))
    val restored = new SchemaTracker
    restored.restoreCatalog(defs, dbs)
    assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "content", "name"))

    // resume at 3000 → schema as of 2000 (with age)
    val (_, dbs2, defs2) = store.load(Position("mysql-bin.000001", 3000, 7)).get
    val r2 = new SchemaTracker
    r2.restoreCatalog(defs2, dbs2)
    assert(r2.getTableDef("test", "canal_test").get.columns.map(_.name).contains("age"))

    // resume below the first snapshot → none
    assert(store.load(Position("mysql-bin.000001", 500, 7)).isEmpty)
    // different server_id → none
    assert(store.load(Position("mysql-bin.000001", 1500, 8)).isEmpty)
  }

  test("X9 snapshot key: zero-padded filename order == numeric position " +
      "order (the boltdb big-endian trick purge's lexicographic-max relies on)") {
    val dir = Files.createTempDirectory("snapstore-keys")
    val store = new SchemaSnapshotStore(dir)
    val t = freshTracker
    // positions chosen so UNPADDED lexicographic order would be wrong:
    // "9" > "10", "100"; serverId 7 vs 77 likewise
    val positions = Seq(
      Position("mysql-bin.000001", 9L, 7),
      Position("mysql-bin.000001", 10L, 7),
      Position("mysql-bin.000001", 100L, 7),
      Position("mysql-bin.000001", 5L, 77))
    positions.foreach(p => store.save(p, t.getDatabases, t.snapshotCatalog))
    val names = dir.toFile.listFiles().map(_.getName)
      .filter(_.startsWith("snap-")).sorted.toSeq
    // lexicographic filename sort must equal (serverId, pos) numeric sort
    val numeric = positions.sortBy(p => (p.serverId, p.pos))
      .map(p => f"snap-${p.serverId}%020d-${p.name}-${p.pos}%020d.bin")
    assert(names == numeric)
    // and load() picks the numerically-newest at-or-below, not the
    // lexicographically-confusable one
    val (got, _, _) = store.load(Position("mysql-bin.000001", 50L, 7)).get
    assert(got == Position("mysql-bin.000001", 10L, 7))
  }

  test("incremental persistence: O(N/cadence) full snapshots, restore exact at every position") {
    val dir = Files.createTempDirectory("snapstore-incr")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 4)
    val t = freshTracker
    val ddls = (1 to 10).map(i => (s"ALTER TABLE test.canal_test ADD col_$i INT",
      Position("mysql-bin.000001", 1000L * i, 7)))
    ddls.foreach { case (stmt, pos) =>
      t.execDdl(stmt, "test")
      store.record(pos, "test", stmt, t.getDatabases, t.snapshotCatalog)
    }
    // full snapshots only on the first DDL and every 4th after: 1, 5, 9
    val snaps = dir.toFile.listFiles().count(_.getName.startsWith("snap-"))
    assert(snaps == 3, s"expected 3 full snapshots for 10 DDLs at cadence 4, got $snaps")

    // restore at EVERY intermediate position must equal a tracker that
    // applied exactly the DDL prefix — snapshot + logged tail replay
    for (k <- 1 to 10) {
      val resume = Position("mysql-bin.000001", 1000L * k + 500, 7)
      val (snapPos, dbs, defs) = store.load(resume).get
      val restored = new SchemaTracker
      restored.restoreCatalog(defs, dbs)
      val tail = store.ddlTail(snapPos, resume)
      tail.foreach { case (_, db, stmt) => restored.execDdl(stmt, db) }
      val cols = restored.getTableDef("test", "canal_test").get.columns.map(_.name)
      assert(cols == Vector("id", "content", "name") ++ (1 to k).map(i => s"col_$i"),
        s"restore at DDL $k mismatch: $cols")
    }

    // the tail is bounded by the resume position and the snapshot position
    assert(store.ddlTail(Position("mysql-bin.000001", 5000, 7),
      Position("mysql-bin.000001", 7000, 7)).map(_._1.pos) == Vector(6000L, 7000L))
    // other server_id's entries never replay
    assert(store.ddlTail(Position("", 0, 8), Position("mysql-bin.000009", 99999, 8)).isEmpty)
  }

  test("a re-recorded DDL (restart replay) does not double-apply on restore") {
    val dir = Files.createTempDirectory("snapstore-dup")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 8)
    val t = freshTracker
    val pos1 = Position("mysql-bin.000001", 1000, 7)
    val pos2 = Position("mysql-bin.000001", 2000, 7)
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(pos1, "test", "ALTER TABLE test.canal_test ADD age INT",
      t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(pos2, "test", "ALTER TABLE test.canal_test ADD more INT",
      t.getDatabases, t.snapshotCatalog)
    // crash before the sink checkpoint persisted past pos2: the restarted
    // stream re-applies and re-records the SAME DDL at the SAME position
    store.record(pos2, "test", "ALTER TABLE test.canal_test ADD more INT",
      t.getDatabases, t.snapshotCatalog)
    val resume = Position("mysql-bin.000001", 3000, 7)
    val (snapPos, dbs, defs) = store.load(resume).get
    val restored = new SchemaTracker
    restored.restoreCatalog(defs, dbs)
    // replaying the tail must apply 'ADD more' ONCE — a duplicate replay
    // would throw duplicate-column on exactly this restart path
    store.ddlTail(snapPos, resume).foreach { case (_, db, stmt) =>
      restored.execDdl(stmt, db)
    }
    assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "content", "name", "age", "more"))
  }

  test("a corrupted MID-log line fails restore loudly (only the torn tail is tolerated)") {
    val dir = Files.createTempDirectory("snapstore-midcorrupt")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 8)
    val t = freshTracker
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(Position("mysql-bin.000001", 1000, 7), "test",
      "ALTER TABLE test.canal_test ADD age INT", t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(Position("mysql-bin.000001", 2000, 7), "test",
      "ALTER TABLE test.canal_test ADD more INT", t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD third INT", "test")
    store.record(Position("mysql-bin.000001", 3000, 7), "test",
      "ALTER TABLE test.canal_test ADD third INT", t.getDatabases, t.snapshotCatalog)
    // the 1000 line was compacted away with its snapshot; the log now holds
    // 2000 and 3000 — corrupt the FIRST (bad base64), keep the last intact
    val log = dir.resolve("ddl.log")
    val lines = java.nio.file.Files.readAllLines(log)
    lines.set(0, lines.get(0).dropRight(4) + "!!!!")
    java.nio.file.Files.write(log, String.join("\n", lines).concat("\n").getBytes)
    val e = intercept[IllegalStateException] {
      store.ddlTail(Position("", 0, 7), Position("mysql-bin.000009", 1 << 20, 7))
    }
    assert(e.getMessage.contains("corrupt ddl.log line 1"))
  }

  test("purge never deletes the newest snapshot; compaction bounds the log") {
    val dir = Files.createTempDirectory("snapstore-purge")
    // cadence 2: snapshots at DDL 1, 3, 5 — compaction after each snapshot
    // drops lines at-or-below the OLDEST retained snapshot
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 2)
    val t = freshTracker
    (1 to 5).foreach { i =>
      t.execDdl(s"ALTER TABLE test.canal_test ADD c_$i INT", "test")
      store.record(Position("mysql-bin.000001", 1000L * i, 7), "test",
        s"ALTER TABLE test.canal_test ADD c_$i INT", t.getDatabases, t.snapshotCatalog)
    }
    // snapshots exist at 1000, 3000, 5000; oldest retained = 1000 → the
    // log holds only lines with pos > 1000
    val logLines = java.nio.file.Files.readAllLines(dir.resolve("ddl.log"))
    assert(!logLines.isEmpty && logLines.size() < 5,
      s"compaction should have dropped the covered prefix, log has ${logLines.size()}")
    // restore at every position still exact after compaction
    for (k <- 1 to 5) {
      val resume = Position("mysql-bin.000001", 1000L * k + 500, 7)
      val (snapPos, dbs, defs) = store.load(resume).get
      val restored = new SchemaTracker
      restored.restoreCatalog(defs, dbs)
      store.ddlTail(snapPos, resume).foreach { case (_, db, stmt) =>
        restored.execDdl(stmt, db)
      }
      assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
        Vector("id", "content", "name") ++ (1 to k).map(i => s"c_$i"))
    }
    // age out every snapshot file: purge must keep the newest anyway
    import java.nio.file.attribute.FileTime
    val old = FileTime.fromMillis(System.currentTimeMillis() - 30L * 24 * 3600 * 1000)
    java.nio.file.Files.list(dir).forEach { p =>
      if (p.getFileName.toString.startsWith("snap-"))
        java.nio.file.Files.setLastModifiedTime(p, old)
    }
    (6 to 7).foreach { i =>
      t.execDdl(s"ALTER TABLE test.canal_test ADD c_$i INT", "test")
      store.record(Position("mysql-bin.000001", 1000L * i, 7), "test",
        s"ALTER TABLE test.canal_test ADD c_$i INT", t.getDatabases, t.snapshotCatalog)
    }
    // DDL 7 hit the cadence → snapshot(7000) + purge: the fresh snapshot
    // is the newest and survives; the aged older ones go
    val snaps = dir.toFile.listFiles().map(_.getName).filter(_.startsWith("snap-"))
    assert(snaps.exists(_.contains("7000.bin")), s"fresh snapshot kept: ${snaps.toSeq}")
    assert(!snaps.exists(_.contains("1000.bin")) && !snaps.exists(_.contains("3000.bin")),
      s"aged non-newest snapshots should purge: ${snaps.toSeq}")
  }

  test("a /ddl/exec repair forces the next record to write a full snapshot") {
    val dir = Files.createTempDirectory("snapstore-repair")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 100)
    val t = freshTracker
    val gate = new DdlGate(t)
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(Position("mysql-bin.000001", 1000, 7), "test",
      "ALTER TABLE test.canal_test ADD age INT", t.getDatabases, t.snapshotCatalog,
      forceSnapshot = gate.consumeRepairFlag())
    // operator repairs the mirror OUT OF BAND — no stream position exists
    assert(gate.exec("ALTER TABLE test.canal_test ADD repaired INT", "test").isRight)
    // next stream DDL: cadence (100) says log-only, the repair flag forces
    // the full snapshot that is the ONLY way the repair survives a restart
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(Position("mysql-bin.000001", 2000, 7), "test",
      "ALTER TABLE test.canal_test ADD more INT", t.getDatabases, t.snapshotCatalog,
      forceSnapshot = gate.consumeRepairFlag())
    val (snapPos, dbs, defs) = store.load(Position("mysql-bin.000001", 3000, 7)).get
    assert(snapPos.pos == 2000, "repair must force the snapshot at the next DDL")
    val restored = new SchemaTracker
    restored.restoreCatalog(defs, dbs)
    assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name)
      .contains("repaired"))
    // flag is one-shot
    assert(!gate.consumeRepairFlag())
  }

  test("a torn final log line (crash mid-append) is ignored") {
    val dir = Files.createTempDirectory("snapstore-torn")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 4)
    val t = freshTracker
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(Position("mysql-bin.000001", 1000, 7), "test",
      "ALTER TABLE test.canal_test ADD age INT", t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(Position("mysql-bin.000001", 2000, 7), "test",
      "ALTER TABLE test.canal_test ADD more INT", t.getDatabases, t.snapshotCatalog)
    // simulate a crash mid-append: a partial record with no trailing fields
    java.nio.file.Files.write(dir.resolve("ddl.log"), "7\tmysql-bin.00".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    // the 1000 line was compacted with its snapshot; the intact 2000 line
    // replays, the torn tail is dropped without failing the restore
    val tail = store.ddlTail(Position("", 0, 7), Position("mysql-bin.000009", 1 << 20, 7))
    assert(tail.map(_._1.pos) == Vector(2000L))
    assert(tail.head._3 == "ALTER TABLE test.canal_test ADD more INT")
  }

  test("an append AFTER a torn tail repairs the fragment instead of merging into it") {
    val dir = Files.createTempDirectory("snapstore-torn-append")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 100)
    val t = freshTracker
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(Position("mysql-bin.000001", 1000, 7), "test",
      "ALTER TABLE test.canal_test ADD age INT", t.getDatabases, t.snapshotCatalog)
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(Position("mysql-bin.000001", 2000, 7), "test",
      "ALTER TABLE test.canal_test ADD more INT", t.getDatabases, t.snapshotCatalog)
    // crash mid-append leaves a torn fragment with NO trailing newline; the
    // next record() must not concatenate onto it (which would turn the
    // fragment + the new DDL into one malformed NON-final line — a loud
    // ddlTail failure, and a compaction would then silently drop the
    // merged line, losing the valid new DDL)
    java.nio.file.Files.write(dir.resolve("ddl.log"), "7\tmysql-bin.00".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    t.execDdl("ALTER TABLE test.canal_test ADD third INT", "test")
    store.record(Position("mysql-bin.000001", 3000, 7), "test",
      "ALTER TABLE test.canal_test ADD third INT", t.getDatabases, t.snapshotCatalog)
    // restore must see BOTH intact post-snapshot DDLs — no throw, no loss
    val resume = Position("mysql-bin.000001", 4000, 7)
    val (snapPos, dbs, defs) = store.load(resume).get
    val restored = new SchemaTracker
    restored.restoreCatalog(defs, dbs)
    store.ddlTail(snapPos, resume).foreach { case (_, db, stmt) =>
      restored.execDdl(stmt, db)
    }
    assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "content", "name", "age", "more", "third"))
    // and the repaired log has no trace of the fragment
    val lines = java.nio.file.Files.readAllLines(dir.resolve("ddl.log"))
    assert(!lines.toString.contains("mysql-bin.00\t"),
      s"torn fragment must be truncated, log: $lines")
  }

  test("purge protects each server_id's newest snapshot, not just the global newest") {
    val dir = Files.createTempDirectory("snapstore-purge-sid")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 1)
    val t = freshTracker
    // server 7 writes its only snapshot, then fails over to server 9
    t.execDdl("ALTER TABLE test.canal_test ADD age INT", "test")
    store.record(Position("mysql-bin.000001", 1000, 7), "test",
      "ALTER TABLE test.canal_test ADD age INT", t.getDatabases, t.snapshotCatalog)
    // age out everything on disk, then let the NEW server snapshot: the
    // age-based purge runs, and server 7's only snapshot must survive —
    // load()/ddlTail filter per server_id, so deleting it would make every
    // server-7 position unrestorable even though a (newer) server-9
    // snapshot exists
    import java.nio.file.attribute.FileTime
    val old = FileTime.fromMillis(System.currentTimeMillis() - 30L * 24 * 3600 * 1000)
    java.nio.file.Files.list(dir).forEach { p =>
      if (p.getFileName.toString.startsWith("snap-"))
        java.nio.file.Files.setLastModifiedTime(p, old)
    }
    t.execDdl("ALTER TABLE test.canal_test ADD more INT", "test")
    store.record(Position("mysql-bin.000002", 500, 9), "test",
      "ALTER TABLE test.canal_test ADD more INT", t.getDatabases, t.snapshotCatalog)
    assert(store.load(Position("mysql-bin.000001", 2000, 7)).isDefined,
      "server 7's newest snapshot must survive an age purge triggered by server 9")
    assert(store.load(Position("mysql-bin.000002", 600, 9)).isDefined)
  }

  test("a crash between snapshot write and log compaction stays exact on restore") {
    val dir = Files.createTempDirectory("snapstore-torn-compact")
    val store = new SchemaSnapshotStore(dir, snapshotEvery = 2)
    val t = freshTracker
    (1 to 4).foreach { i =>
      t.execDdl(s"ALTER TABLE test.canal_test ADD c_$i INT", "test")
      store.record(Position("mysql-bin.000001", 1000L * i, 7), "test",
        s"ALTER TABLE test.canal_test ADD c_$i INT", t.getDatabases, t.snapshotCatalog)
    }
    // construct the exact disk state a crash inside record() leaves when it
    // dies BETWEEN save() and compactLog(): the DDL-5 line appended, the
    // DDL-5 snapshot written, but the log still holding every pre-compaction
    // line — then the restarted stream re-applies and re-records DDL 5
    // (its sink checkpoint never persisted), duplicating the tail line
    t.execDdl("ALTER TABLE test.canal_test ADD c_5 INT", "test")
    val p5 = Position("mysql-bin.000001", 5000, 7)
    val preCompaction = java.nio.file.Files.readAllLines(dir.resolve("ddl.log"))
    store.record(p5, "test", "ALTER TABLE test.canal_test ADD c_5 INT",
      t.getDatabases, t.snapshotCatalog) // writes the 5000 snapshot + compacts
    val compacted = java.nio.file.Files.readAllLines(dir.resolve("ddl.log"))
    // crash state: pre-compaction lines + the 5000 line twice (restart re-record)
    val line5 = compacted.toArray.map(_.toString).filter(_.contains("\t5000\t"))
    assert(line5.nonEmpty)
    val crashLog = (preCompaction.toArray.map(_.toString) ++ line5 ++ line5)
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(dir.resolve("ddl.log"), crashLog.getBytes)
    // plus a stale tmp from a second crash flavor (tmp written, move lost)
    java.nio.file.Files.write(dir.resolve("ddl.log.tmp"), "garbage\n".getBytes)
    // a fresh store over the crashed dir must restore EXACTLY at every position
    val reopened = new SchemaSnapshotStore(dir, snapshotEvery = 2)
    for (k <- 1 to 5) {
      val resume = Position("mysql-bin.000001", 1000L * k + 500, 7)
      val (snapPos, dbs, defs) = reopened.load(resume).get
      val restored = new SchemaTracker
      restored.restoreCatalog(defs, dbs)
      reopened.ddlTail(snapPos, resume).foreach { case (_, db, stmt) =>
        restored.execDdl(stmt, db)
      }
      assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
        Vector("id", "content", "name") ++ (1 to k).map(i => s"c_$i"),
        s"restore at DDL $k after torn compaction")
    }
    // and the next cadence snapshot re-runs compaction cleanly over the mess
    (6 to 7).foreach { i =>
      t.execDdl(s"ALTER TABLE test.canal_test ADD c_$i INT", "test")
      reopened.record(Position("mysql-bin.000001", 1000L * i, 7), "test",
        s"ALTER TABLE test.canal_test ADD c_$i INT", t.getDatabases, t.snapshotCatalog)
    }
    val resume = Position("mysql-bin.000001", 8000, 7)
    val (snapPos, dbs, defs) = reopened.load(resume).get
    val restored = new SchemaTracker
    restored.restoreCatalog(defs, dbs)
    reopened.ddlTail(snapPos, resume).foreach { case (_, db, stmt) =>
      restored.execDdl(stmt, db)
    }
    assert(restored.getTableDef("test", "canal_test").get.columns.map(_.name) ==
      Vector("id", "content", "name") ++ (1 to 7).map(i => s"c_$i"))
  }
}
