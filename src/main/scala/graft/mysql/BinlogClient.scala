package graft.mysql

import graft.cdc._
import java.io.{InputStream, OutputStream}
import java.net.Socket
import scala.collection.mutable

/** The live-source front door (S1/S2/S3): a MySQL replication client over
  * raw streams — handshake/auth, COM_QUERY with text resultsets, the
  * ROW-format precondition (S2, /root/reference/canal/canal.go:368-377),
  * COM_REGISTER_SLAVE + COM_BINLOG_DUMP, the replication heartbeat (T8,
  * master_heartbeat_period), and the event stream mapped to the same
  * `Operation` model the replay source feeds (so everything downstream —
  * filters, sinks, checkpoints — is source-agnostic).
  *
  * The transport is a pluggable stream pair: production wraps a Socket
  * ([[BinlogClient.connect]]), specs drive the protocol with scripted
  * conversations. Rows→Operation mapping resolves column names through the
  * schema mirror (the binlog carries no names — exactly why the reference
  * tracks schema, SURVEY §1.3).
  */
final class BinlogClient(in: InputStream, out: OutputStream, user: String, password: String) {

  import Packets._

  private var seq = 0
  private def send(payload: Array[Byte]): Unit = { writePacket(out, seq, payload); seq += 1 }
  private def recv(): Array[Byte] = {
    val (s, p) = readPacket(in)
    seq = s + 1
    p
  }
  private def resetSeq(): Unit = seq = 0

  /** Connection phase: greeting → HandshakeResponse41 → OK (or
    * AuthSwitchRequest for mysql_native_password → scramble → OK). */
  def connect(): Handshake.HandshakeV10 = {
    val greeting = Handshake.parseHandshake(recv())
    send(Handshake.response41(user, password, greeting.authPluginData))
    var res = recv()
    if ((res(0) & 0xff) == 0xfe && res.length > 5) {
      // AuthSwitchRequest: plugin name NUL, fresh nonce
      val r = new Reader(res); r.skip(1)
      val plugin = r.nulString()
      require(plugin == "mysql_native_password",
        s"unsupported auth plugin switch: $plugin")
      val nonce = r.restBytes().takeWhile(_ != 0)
      send(Handshake.nativePasswordScramble(password, nonce))
      res = recv()
    }
    Handshake.parseOkErr(res) match {
      case Left(e) => throw new IllegalStateException(s"auth failed: ${e.code} ${e.message}")
      case Right(_) => greeting
    }
  }

  final case class ResultSet(columns: Vector[String], rows: Vector[Vector[Option[String]]]) {
    def getString(row: Int, col: Int): Option[String] = rows(row)(col)
  }

  /** COM_QUERY with a text-protocol resultset (or OK for non-SELECT). */
  def query(sql: String): Either[ResultSet, Handshake.Ok] = {
    resetSeq()
    send(new Writer().u8(COM_QUERY).eofStr(sql).result)
    val first = recv()
    (first(0) & 0xff) match {
      case 0x00 | 0xff =>
        Handshake.parseOkErr(first) match {
          case Left(e) => throw BinlogClient.MysqlQueryError(e.code, e.message)
          case Right(ok) => Right(ok)
        }
      case _ =>
        val nCols = new Reader(first).lenenc().toInt
        val cols = Vector.fill(nCols) {
          val r = new Reader(recv())
          // ColumnDefinition41: catalog, schema, table, org_table, name, ...
          r.lenencString(); r.lenencString(); r.lenencString(); r.lenencString()
          r.lenencString()
        }
        skipEof() // EOF after column definitions
        val rows = Vector.newBuilder[Vector[Option[String]]]
        var done = false
        while (!done) {
          val p = recv()
          if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
          else if ((p(0) & 0xff) == 0xff) {
            // mid-resultset ERR (KILL QUERY, max_execution_time, lock
            // timeout): the rows so far are a TRUNCATED result — raising
            // is mandatory, returning them as complete would silently
            // lose data in a bootstrap SELECT
            val e = Handshake.parseOkErr(p).swap.getOrElse(Handshake.Err(0, "", "unknown"))
            throw new IllegalStateException(
              s"query aborted mid-resultset: ${e.code} ${e.message}")
          } else {
            val r = new Reader(p)
            rows += Vector.fill(nCols)(r.lenencStringOpt())
          }
        }
        Left(ResultSet(cols, rows.result()))
    }
  }

  private def skipEof(): Unit = { recv(); () }

  /** S2 — the ROW-format precondition (canal.go:368-377): refuse to stream
    * unless the server logs row images. */
  def checkBinlogRowFormat(): Either[String, Unit] =
    query("""SHOW GLOBAL VARIABLES LIKE "binlog_format";""") match {
      case Left(rs) if rs.rows.nonEmpty =>
        rs.getString(0, 1) match {
          case Some("ROW") => Right(())
          case other => Left(s"binlog must be ROW format, but ${other.getOrElse("unknown")} now")
        }
      case _ => Left("could not read binlog_format variable")
    }

  /** S2 — the row-image precondition (canal.go:350-366 CheckBinlogRowImage):
    * `binlog_format=ROW` alone is not enough — a master running
    * `binlog_row_image=MINIMAL` (or NOBLOB) logs PARTIAL before-images, and
    * every downstream UPDATE/DELETE current-state merge would be silently
    * wrong. Pre-5.6 servers don't know the variable and return an empty
    * resultset — accepted, like the reference's empty-string degrade. The
    * reference gates this check on the MySQL flavor; here it runs
    * unconditionally, which is strictly safer — MariaDB speaks the same
    * variable, and a server without it hits the empty-result path. */
  def checkBinlogRowImage(expected: String = "FULL"): Either[String, Unit] =
    query("""SHOW GLOBAL VARIABLES LIKE "binlog_row_image";""") match {
      case Left(rs) =>
        rs.rows.headOption.flatMap(_.lift(1).flatten).filter(_.nonEmpty) match {
          case None => Right(()) // pre-5.6: variable absent
          case Some(img) if img.equalsIgnoreCase(expected) => Right(())
          case Some(img) =>
            Left(s"MySQL uses $img binlog row image, but we want $expected")
        }
      case Right(_) => Left("could not read binlog_row_image variable")
    }

  /** T8 — replication heartbeat: the master emits HEARTBEAT events when
    * idle longer than this period, keeping the connection verifiably
    * alive. Set BEFORE requesting the dump (value is nanoseconds). */
  def setHeartbeatPeriod(seconds: Double): Unit =
    query(s"SET @master_heartbeat_period = ${(seconds * 1e9).toLong};") match {
      case Right(_) => ()
      case Left(_) => throw new IllegalStateException("expected OK for SET heartbeat")
    }

  def registerSlave(serverId: Long, host: String = "", port: Int = 0): Unit = {
    resetSeq()
    val w = new Writer().u8(COM_REGISTER_SLAVE).u32(serverId)
    w.u8(host.length); w.eofStr(host)
    w.u8(0) // user
    w.u8(0) // password
    w.u16(port); w.u32(0); w.u32(0)
    send(w.result)
    Handshake.parseOkErr(recv()) match {
      case Left(e) => throw new IllegalStateException(s"register slave failed: ${e.message}")
      case Right(_) => ()
    }
  }

  /** Announce checksum awareness and learn the server's setting — REQUIRED
    * before any dump command: a MySQL >= 5.6 master with the default
    * `binlog_checksum=CRC32` refuses COM_BINLOG_DUMP from a client that
    * has not set `@master_binlog_checksum` ("Slave can not handle
    * replication events with the checksum..."). Returns whether events
    * will arrive checksummed, which must ALSO initialize the stream state:
    * the artificial ROTATE the server sends BEFORE the first FDE already
    * carries the CRC, so deriving the state only from the FDE would leak
    * 4 CRC bytes into that rotate's file name. Pre-5.6 servers know
    * neither variable — both failures degrade to "no checksum". */
  private def announceChecksum(): Boolean = {
    // ONLY an ERR reply about the variable itself (pre-5.6 server) may
    // degrade to "no checksum". I/O failures and mid-resultset aborts must
    // propagate: swallowing them on a server that DOES checksum would leave
    // 4 CRC trailer bytes on every event and parse garbage downstream.
    val unknownVariable: PartialFunction[Throwable, Boolean] = {
      case BinlogClient.MysqlQueryError(BinlogClient.ER_UNKNOWN_SYSTEM_VARIABLE, _) => false
    }
    val set =
      try query("SET @master_binlog_checksum = @@global.binlog_checksum").isRight
      catch unknownVariable
    if (!set) false
    else try query("SELECT @@global.binlog_checksum") match {
      case Left(rs) => rs.rows.headOption.flatMap(_.headOption.flatten)
        .exists(_.equalsIgnoreCase("CRC32"))
      case Right(_) => false
    } catch unknownVariable
  }

  /** COM_BINLOG_DUMP from (file, pos): the replication stream. Each packet
    * is 0x00 ++ event; CRC32 checksums (announced up front and confirmed
    * by each FDE) are stripped before parsing; TABLE_MAP registrations
    * accumulate for rows decode. */
  def dump(fileName: String, position: Long, serverId: Long):
      Iterator[(BinlogEvents.EventHeader, BinlogEvents.Event)] = {
    val checksummed = announceChecksum()
    resetSeq()
    send(new Writer().u8(COM_BINLOG_DUMP).u32(position).u16(0).u32(serverId)
      .eofStr(fileName).result)
    eventStream(checksummed)
  }

  /** COM_BINLOG_DUMP_GTID from a GTID set: the failover-surviving start
    * (the server resolves the right file+pos for the gaps itself, so a
    * checkpointed GtidSet replays correctly even after the master changed
    * — the reference's GtidEnabled mode, canal/sync.go:46-67). The wire
    * SID block is the public layout: n_sids, then per SID 16 uuid bytes +
    * interval pairs with EXCLUSIVE upper bounds (our model is inclusive). */
  def dumpGtid(gset: GtidSet, serverId: Long,
      fileName: String = "", position: Long = 4):
      Iterator[(BinlogEvents.EventHeader, BinlogEvents.Event)] = {
    val checksummed = announceChecksum()
    resetSeq()
    val w = new Writer().u8(COM_BINLOG_DUMP_GTID)
      .u16(BINLOG_THROUGH_GTID)
      .u32(serverId)
      .u32(fileName.length.toLong)
    w.eofStr(fileName)
    w.u64(position)
    val sid = new Writer
    sid.u64(gset.sets.size.toLong)
    for ((uuid, ivs) <- gset.sets.toSeq.sortBy(_._1)) {
      sid.raw(uuidBytes(uuid))
      sid.u64(ivs.size.toLong)
      for ((lo, hi) <- ivs) { sid.u64(lo); sid.u64(hi + 1) }
    }
    val sidData = sid.result
    w.u32(sidData.length.toLong)
    w.raw(sidData)
    send(w.result)
    eventStream(checksummed)
  }

  /** MariaDB-flavor GTID start: MariaDB has no dump-GTID command — the
    * replica announces its state in session variables, then issues a plain
    * COM_BINLOG_DUMP from (\"\", 0) and the server resolves the position
    * (public MariaDB replication protocol; the reference reaches it
    * through go-mysql's mariadb path when flavor = \"mariadb\",
    * ckp/checkpoint.go:56-63). */
  def dumpMariadbGtid(gset: GtidSet.Mariadb, serverId: Long):
      Iterator[(BinlogEvents.EventHeader, BinlogEvents.Event)] = {
    def setVar(sql: String): Unit = query(sql) match {
      case Right(_) => ()
      case Left(_) => throw new IllegalStateException(s"expected OK for: $sql")
    }
    setVar("SET @mariadb_slave_capability = 4")
    setVar(s"SET @slave_connect_state = '${gset.toString}'")
    setVar("SET @slave_gtid_strict_mode = 0")
    setVar("SET @slave_gtid_ignore_duplicates = 0")
    dump("", 0, serverId)
  }

  private def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"malformed GTID source id: $uuid")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** Shared dump-response loop for both dump commands. `initChecksummed`
    * comes from the announce query, so the pre-FDE artificial ROTATE is
    * stripped correctly too; each FDE then re-confirms (a rotation to a
    * file written under a different setting announces itself). */
  private def eventStream(initChecksummed: Boolean)
      : Iterator[(BinlogEvents.EventHeader, BinlogEvents.Event)] = {
    val tables = mutable.Map.empty[Long, BinlogEvents.TableMap]
    var checksummed = initChecksummed
    new Iterator[(BinlogEvents.EventHeader, BinlogEvents.Event)] {
      private var nextEv: (BinlogEvents.EventHeader, BinlogEvents.Event) = _
      private var eof = false
      private def advance(): Unit = {
        nextEv = null
        while (nextEv == null && !eof) {
          // a transport EOF mid-dump PROPAGATES: a healthy master never
          // half-closes a dump — the clean end is the 0xFE EOF packet
          // below. Callers with a reconnect policy (LiveBinlogFeed) catch
          // the IOException and resume from their cursor.
          val p = recv()
          (p(0) & 0xff) match {
            case 0x00 =>
              // never strip the CRC from a FORMAT_DESCRIPTION event
              // (type byte at p[5]: status + 4-byte timestamp): its
              // checksum-alg byte sits at length-5 COUNTING the trailing
              // CRC, and mid-stream FDEs (every binlog rotation) would
              // otherwise lose it and flip the state off
              val isFde = p.length > 5 &&
                (p(5) & 0xff) == BinlogEvents.FORMAT_DESCRIPTION_EVENT
              val body =
                if (checksummed && !isFde) java.util.Arrays.copyOfRange(p, 1, p.length - 4)
                else java.util.Arrays.copyOfRange(p, 1, p.length)
              val r = new Reader(body)
              val header = BinlogEvents.parseHeader(r)
              val ev = BinlogEvents.parseEvent(header, r, tables)
              ev match {
                case fd: BinlogEvents.FormatDescription =>
                  checksummed = fd.checksumAlg == 1
                case tm: BinlogEvents.TableMap => tables(tm.tableId) = tm
                case _ => ()
              }
              nextEv = (header, ev)
            case 0xfe => eof = true // server EOF
            case 0xff =>
              val e = Handshake.parseOkErr(p).swap.getOrElse(
                Handshake.Err(0, "", "unknown"))
              throw new IllegalStateException(s"dump error: ${e.code} ${e.message}")
          }
        }
      }
      // advancement is LAZY (in hasNext, not next): with an eager
      // prefetch, a transport error while reading event N+1 would throw
      // from the next() that should have RETURNED event N — dropping the
      // last fully received event exactly when a reconnecting caller
      // needs its position as the resume cursor
      override def hasNext: Boolean = {
        if (nextEv == null && !eof) advance()
        nextEv != null
      }
      override def next(): (BinlogEvents.EventHeader, BinlogEvents.Event) = {
        if (!hasNext) throw new NoSuchElementException("binlog stream ended")
        val v = nextEv; nextEv = null; v
      }
    }
  }
}

object BinlogClient {
  /** An ERR packet reply to COM_QUERY, carrying the server error code so
    * callers can distinguish "this server doesn't know the variable"
    * (degrade gracefully) from real failures (propagate). */
  final case class MysqlQueryError(code: Int, errMessage: String)
    extends IllegalStateException(s"query failed: $code $errMessage")

  val ER_UNKNOWN_SYSTEM_VARIABLE = 1193

  /** Production entry: TCP socket transport. Fixture-driven tests construct
    * the class directly with scripted streams. */
  def connect(host: String, port: Int, user: String, password: String): BinlogClient = {
    val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    new BinlogClient(sock.getInputStream, sock.getOutputStream, user, password)
  }
}

/** Binlog events → the `Operation` model (the exact stream the replay
  * source feeds — /root/reference/canal/sync.go:84-225 event switch).
  * Column NAMES come from the schema mirror: the binlog's TABLE_MAP carries
  * only type codes, so rows decode consults `schemaLookup` (SchemaTracker)
  * and falls back to positional names. Statement events route through the
  * normalizer downstream; this mapper only classifies BEGIN vs DDL. */
final class BinlogToOps(schemaLookup: (String, String) => Option[TableDef]) {
  import BinlogEvents._

  private var gtidPending: Option[String] = None

  def toOperation(header: EventHeader, ev: Event): Option[Operation] = {
    def h(opType: String) =
      OperationHeader(header.serverId, opType, header.timestamp, header.logPos)
    ev match {
      case Rotate(pos, next) =>
        Some(Operation(h(OpType.Rotate), nextLogName = Some(next), nextLogPos = Some(pos)))
      case Query(_, schema, q) if q.trim.equalsIgnoreCase("BEGIN") =>
        Some(Operation(h(OpType.Begin), gtid = consumeGtid(), database = Some(schema)))
      case Query(_, schema, q) =>
        Some(Operation(h(OpType.Ddl), gtid = consumeGtid(),
          database = Some(schema), statement = Some(q)))
      case Xid(_) =>
        Some(Operation(h(OpType.Commit)))
      case Gtid(uuid, gno) =>
        gtidPending = Some(s"$uuid:$gno")
        Some(Operation(h(OpType.Gtid), gtid = gtidPending))
      case MariadbGtid(domain, seq) =>
        // MariaDB flavor: domain-server-seq (server from the event header)
        gtidPending = Some(s"$domain-${header.serverId}-$seq")
        Some(Operation(h(OpType.Gtid), gtid = gtidPending))
      case _: Rows =>
        None // handled by toRowsOperation (needs the client's TableMap)
      case _: Heartbeat => None // T8 keepalive: no operation, stream is alive
      case _: FormatDescription | _: TableMap | _: Unsupported => None
    }
  }

  /** Rows events carry the TableMap explicitly (the client's registry). */
  def toRowsOperation(header: EventHeader, rows: Rows, tm: TableMap): Operation = {
    val opType = rows.kind match {
      case "insert" => OpType.Insert
      case "update" => OpType.Update
      case _ => OpType.Delete
    }
    val tdef = schemaLookup(tm.schema, tm.table).getOrElse(
      TableDef(tm.schema, tm.table,
        tm.columnTypes.zipWithIndex.map { case (t, i) =>
          ColumnDef(s"col_$i", s"type_$t", t)
        }.toVector, "utf8"))
    Operation(
      OperationHeader(header.serverId, opType, header.timestamp, header.logPos),
      gtid = consumeGtid(),
      table = Some(tdef),
      rows = rows.rows.map { case (b, a) => OpRow(b, a) })
  }

  private def consumeGtid(): Option[String] = {
    val g = gtidPending
    gtidPending = None
    g
  }
}
