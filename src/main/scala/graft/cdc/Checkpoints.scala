package graft.cdc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Length-prefixed UTF-8 string framing shared by the checkpoint and
  * schema-snapshot codecs. readStr bounds the declared length: a corrupt
  * or truncated file must fail with a clean error, not a
  * NegativeArraySizeException or a multi-GB allocation. */
private[cdc] object StrCodec {
  import java.io.{DataInputStream, DataOutputStream}
  import java.nio.charset.StandardCharsets.UTF_8
  private val MaxLen = 64 << 20 // 64 MiB: far above any schema/ckp string
  def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
  }
  def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    require(n >= 0 && n <= MaxLen, s"corrupt string frame: length $n")
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
}

/** Per-sink checkpoint: progress + free-form string context
  * (acked_seq/acked_offset for the Kafka sink —
  * /root/reference/ckp/checkpoint.go:67-71). */
final case class Checkpoint(progress: Progress, ctx: Map[String, String] = Map.empty) {
  def withIntCtx(key: String, v: Long): Checkpoint = copy(ctx = ctx.updated(key, v.toString))
  def getIntCtx(key: String, dflt: Long): Long = ctx.get(key).map(_.toLong).getOrElse(dflt)
}

trait CkpStorage {
  def save(data: Array[Byte]): Unit
  def load(): Option[Array[Byte]]
}

object CkpStorage {
  /** Selectable storage: `zk://host:port[,host:port]/path` → ZooKeeper
    * ([[ZkCkpStorage]]); anything else is a local directory for the
    * dual-file store. */
  def forUri(uri: String): CkpStorage =
    if (uri.startsWith("zk://")) {
      val rest = uri.stripPrefix("zk://")
      val slash = rest.indexOf('/')
      require(slash > 0, s"zk checkpoint uri needs a znode path: $uri")
      new ZkCkpStorage(rest.substring(0, slash), rest.substring(slash))
    } else new FileCkpStorage(java.nio.file.Paths.get(uri))
}

/** Atomic dual-file ping-pong storage
  * (/root/reference/ckp/storage_file.go:70-104): writes alternate between
  * two files so a torn write can never destroy the last good checkpoint;
  * load picks the newer parseable one (we embed a monotonic version rather
  * than trusting mtime). */
final class FileCkpStorage(dir: Path) extends CkpStorage {
  Files.createDirectories(dir)
  private val files = Array(dir.resolve("ckp.0"), dir.resolve("ckp.1"))
  private var nextToWrite = 0
  private var version: Long = {
    val vs = files.map(readVersioned(_).map(_._1).getOrElse(-1L))
    // continue writing after the newer file, into the older slot
    nextToWrite = if (vs(0) > vs(1)) 1 else 0
    math.max(vs(0), math.max(vs(1), 0L))
  }

  private def readVersioned(p: Path): Option[(Long, Array[Byte])] =
    try {
      if (!Files.exists(p)) None
      else {
        val all = Files.readAllBytes(p)
        if (all.length < 12) None
        else {
          val in = new DataInputStream(new ByteArrayInputStream(all))
          val v = in.readLong()
          val n = in.readInt()
          if (n < 0 || n > all.length - 12) None
          else {
            val data = new Array[Byte](n)
            in.readFully(data)
            Some((v, data))
          }
        }
      }
    } catch { case _: Exception => None }

  override def save(data: Array[Byte]): Unit = {
    version += 1
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(version)
    out.writeInt(data.length)
    out.write(data)
    out.flush()
    val ch = Files.newByteChannel(files(nextToWrite),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.SYNC)
    try ch.write(java.nio.ByteBuffer.wrap(bos.toByteArray))
    finally ch.close()
    nextToWrite = (nextToWrite + 1) % 2
  }

  override def load(): Option[Array[Byte]] =
    files.flatMap(readVersioned).sortBy(-_._1).headOption.map(_._2)
}

/** In-memory storage for tests (mirrors ckp/storage_mock.go). */
final class MemoryCkpStorage extends CkpStorage {
  private var data: Option[Array[Byte]] = None
  override def save(d: Array[Byte]): Unit = data = Some(d)
  override def load(): Option[Array[Byte]] = data
}

/** Checkpoint manager: registry of per-sink checkpoints, min-progress
  * computation with the aligned-progress fallback, persistence
  * (/root/reference/ckp/manager.go). */
final class CkpManager(storage: CkpStorage) {
  private val ckps = mutable.LinkedHashMap.empty[String, Checkpoint]
  private var alignedProgress: Option[Progress] = None

  loadAll()

  def update(name: String, ckp: Checkpoint): Unit = ckps.update(name, ckp)
  def get(name: String): Option[Checkpoint] = ckps.get(name)
  def names: Vector[String] = ckps.keys.toVector

  def setAlignedProgress(p: Progress): Unit = {
    alignedProgress = Some(p)
    persist()
  }

  /** Restart position: the MINIMUM progress across all sinks — every sink
    * must see everything at least once. When sinks sit on different
    * server_ids (mid-failover), positions are incomparable and the last
    * aligned progress is the only safe floor
    * (/root/reference/ckp/manager.go:160-196). */
  def getMinProgress: Progress = {
    var min: Progress = Progress.zero
    for (ckp <- ckps.values) {
      val p = ckp.progress
      if (!p.isZero) {
        if (min.isZero) min = p
        else if (p.pos.serverId != min.pos.serverId) {
          return alignedProgress.getOrElse(
            throw new IllegalStateException("different server_id in ckps but no aligned progress"))
        } else if (p.compare(min) < 0) min = p
      }
    }
    min
  }

  /** All sinks caught up to `target` (the drain barrier for DDL/failover,
    * /root/reference/ckp/manager.go:224-262). */
  def allReached(target: Progress): Boolean =
    ckps.values.forall { ckp =>
      val p = ckp.progress
      !p.isZero && p.pos.serverId == target.pos.serverId && p.compare(target) >= 0
    }

  // ---------- persistence ----------

  import StrCodec.{writeStr, readStr}
  private def writeProgress(out: DataOutputStream, p: Progress): Unit = {
    writeStr(out, p.pos.name); out.writeLong(p.pos.pos); out.writeLong(p.pos.serverId)
    writeStr(out, p.gset.map(_.toString).getOrElse(""))
    out.writeBoolean(p.gset.isDefined)
  }
  private def readProgress(in: DataInputStream): Progress = {
    val name = readStr(in); val pos = in.readLong(); val sid = in.readLong()
    val gs = readStr(in); val hasG = in.readBoolean()
    Progress(Position(name, pos, sid), if (hasG) Some(Gset.parse(gs)) else None)
  }

  def persist(): Unit = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(alignedProgress.isDefined)
    alignedProgress.foreach(writeProgress(out, _))
    out.writeInt(ckps.size)
    ckps.foreach { case (name, ckp) =>
      writeStr(out, name)
      writeProgress(out, ckp.progress)
      out.writeInt(ckp.ctx.size)
      ckp.ctx.foreach { case (k, v) => writeStr(out, k); writeStr(out, v) }
    }
    out.flush()
    storage.save(bos.toByteArray)
  }

  private def loadAll(): Unit =
    storage.load().foreach { data =>
      val in = new DataInputStream(new ByteArrayInputStream(data))
      if (in.readBoolean()) alignedProgress = Some(readProgress(in))
      val n = in.readInt()
      (0 until n).foreach { _ =>
        val name = readStr(in)
        val p = readProgress(in)
        val ctx = (0 until in.readInt()).map(_ => (readStr(in), readStr(in))).toMap
        ckps.update(name, Checkpoint(p, ctx))
      }
    }
}

/** The snapshot binary codec, shared by the file store and the
  * MySQL-backed store ([[graft.mysql.MysqlSnapshotStorage]]). */
object SchemaSnapshotCodec {
  import StrCodec.{writeStr, readStr}

  def encode(pos: Position, databases: Seq[String], defs: Seq[TableDef]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeStr(out, pos.name); out.writeLong(pos.pos); out.writeLong(pos.serverId)
    out.writeInt(databases.size); databases.foreach(writeStr(out, _))
    out.writeInt(defs.size)
    defs.foreach { t =>
      writeStr(out, t.database); writeStr(out, t.name); writeStr(out, t.charset)
      out.writeInt(t.columns.size)
      t.columns.foreach { c =>
        writeStr(out, c.name); writeStr(out, c.sqlType); out.writeInt(c.innerType)
        writeStr(out, c.key); writeStr(out, c.charset)
        out.writeBoolean(c.unsigned); out.writeBoolean(c.nullable)
      }
    }
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): (Position, Vector[String], Vector[TableDef]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val name = readStr(in); val p = in.readLong(); val sid = in.readLong()
    val dbs = Vector.fill(in.readInt())(readStr(in))
    val defs = Vector.fill(in.readInt()) {
      val db = readStr(in); val tname = readStr(in); val charset = readStr(in)
      val cols = Vector.fill(in.readInt()) {
        ColumnDef(readStr(in), readStr(in), in.readInt(), readStr(in), readStr(in),
          in.readBoolean(), in.readBoolean())
      }
      TableDef(db, tname, cols, charset)
    }
    (Position(name, p, sid), dbs, defs)
  }

  /** Position header only (for cheap listings). */
  def decodeHeader(bytes: Array[Byte]): Position = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val name = readStr(in); val pos = in.readLong(); val sid = in.readLong()
    Position(name, pos, sid)
  }
}

/** Schema snapshots keyed by replication position — restart restores the
  * catalog AS OF the resume position (/root/reference/schema/tracker.go:54-72,
  * boltdb semantics of storage_boltdb.go:75-114 incl. the 7-day purge at
  * :200-238). One binary file per snapshot in a directory.
  *
  * Persistence is STATEMENT-LEVEL incremental — the reference's own TODO
  * (schema/tracker.go:229-240 persists a full catalog per DDL and notes the
  * write amplification): every applied DDL appends one (position, db,
  * statement) record to an append-only log, and a FULL snapshot is written
  * only on the first DDL and every `snapshotEvery`-th after it. Restore =
  * newest snapshot at-or-below the resume position + replay of the logged
  * DDL tail between the snapshot and the resume point — exact at every
  * position, with O(#DDLs / snapshotEvery) full writes instead of O(#DDLs).
  * The first-DDL snapshot keeps every restart position restorable (a
  * log-only prefix would otherwise have nothing to replay onto). The
  * in-memory cadence counter resets on process restart, which can only make
  * snapshots MORE frequent than the cadence — never less restorable. */
final class SchemaSnapshotStore(dir: Path, purgeAfterDays: Int = 7,
    snapshotEvery: Int = 8) {
  Files.createDirectories(dir)

  private val ddlLog = dir.resolve("ddl.log")
  private var sinceSnapshot = 0 // DDLs appended since the last full snapshot

  private def fileFor(pos: Position): Path =
    // big-endian-style zero-padded offset keeps lexicographic == numeric order
    // (the reference's boltdb key trick, storage_boltdb.go:256-264)
    dir.resolve(f"snap-${pos.serverId}%020d-${pos.name}-${pos.pos}%020d.bin")

  def save(pos: Position, databases: Seq[String], defs: Seq[TableDef]): Unit = {
    Files.write(fileFor(pos), SchemaSnapshotCodec.encode(pos, databases, defs))
    purge()
  }

  /** Record one applied DDL: always append it to the statement log; write a
    * full snapshot only at the cadence (first DDL, then every
    * `snapshotEvery`-th) — or when `forceSnapshot` says the catalog has
    * out-of-band mutations (a /ddl/exec repair) that only a full snapshot
    * can persist. The catalog arguments are by-name so the cheap log-only
    * path never materializes a snapshot it will not write. */
  def record(pos: Position, currentDb: String, statement: String,
      databases: => Seq[String], defs: => Seq[TableDef],
      forceSnapshot: Boolean = false): Unit = synchronized {
    val b64 = java.util.Base64.getEncoder
    val line = s"${pos.serverId}\t${pos.name}\t${pos.pos}\t" +
      s"${b64.encodeToString(currentDb.getBytes(UTF_8))}\t" +
      s"${b64.encodeToString(statement.getBytes(UTF_8))}\n"
    repairTornTail()
    Files.write(ddlLog, line.getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val snapshotNow = forceSnapshot ||
      sinceSnapshot == 0 || sinceSnapshot >= snapshotEvery
    sinceSnapshot = if (snapshotNow) 1 else sinceSnapshot + 1
    if (snapshotNow) { save(pos, databases, defs); compactLog() }
  }

  /** A crash mid-append leaves a torn final line with no trailing newline;
    * a subsequent APPEND would then merge the torn fragment and the new
    * record into one malformed NON-final line — ddlTail fails loudly on
    * non-final corruption, and compactLog would drop the merged line,
    * silently losing the valid new DDL. So before every append, truncate a
    * torn tail back to the last newline. Dropping the fragment is exact:
    * a DDL whose append tore never reported applied, which is precisely
    * the case ddlTail's torn-tail tolerance already covers. */
  private def repairTornTail(): Unit = {
    if (!Files.isRegularFile(ddlLog)) return
    val bytes = Files.readAllBytes(ddlLog)
    if (bytes.isEmpty || bytes.last == '\n') return
    val lastNl = bytes.lastIndexOf('\n'.toByte)
    val ch = java.nio.channels.FileChannel.open(ddlLog, StandardOpenOption.WRITE)
    try ch.truncate((lastNl + 1).toLong) finally ch.close()
  }

  /** Logged DDLs with `after < position ≤ upTo` (same server_id), in log
    * order, DEDUPLICATED by position: a crash between applying a DDL and
    * persisting the sink checkpoint makes the restarted stream re-apply
    * and re-record it, and replaying the duplicate line would double-apply
    * the DDL on the NEXT restore (duplicate-column crash). Positions are
    * unique per DDL, so first-occurrence-wins is exact. A torn FINAL line
    * (crash mid-append) is ignored — its DDL never reported applied; a
    * malformed line anywhere EARLIER is on-disk corruption and fails
    * loudly rather than silently dropping a schema change. */
  def ddlTail(after: Position, upTo: Position): Vector[(Position, String, String)] = {
    if (!Files.isRegularFile(ddlLog)) return Vector.empty
    val b64 = java.util.Base64.getDecoder
    val lines = Files.readAllLines(ddlLog, UTF_8).asScala.toVector
    val seen = scala.collection.mutable.Set.empty[Position]
    lines.zipWithIndex.flatMap { case (line, i) =>
      def malformed(cause: Throwable): Nothing =
        throw new IllegalStateException(
          s"corrupt ddl.log line ${i + 1}/${lines.size}: '$line'", cause)
      line.split('\t') match {
        case Array(sid, name, p, db, stmt) =>
          try {
            val pos = Position(name, p.toLong, sid.toLong)
            if (pos.serverId == upTo.serverId && seen.add(pos) &&
              pos.compare(after) > 0 && pos.compare(upTo) <= 0)
              Some((pos, new String(b64.decode(db), UTF_8),
                new String(b64.decode(stmt), UTF_8)))
            else None
          } catch {
            case e: Exception if i == lines.size - 1 => None // torn tail
            case e: Exception => malformed(e)
          }
        case _ if i == lines.size - 1 => None // torn tail
        case _ => malformed(null)
      }
    }
  }

  /** Load the newest snapshot at-or-below `pos` (same server_id only). */
  def load(pos: Position): Option[(Position, Vector[String], Vector[TableDef])] = {
    val candidates = list()
      .filter(p => p.serverId == pos.serverId && p.compare(pos) <= 0)
    candidates.sortWith((a, b) => a.compare(b) > 0).headOption.map(read)
  }

  /** Files.list streams hold an open DirectoryStream — close them or a
    * long-running process leaks one fd per snapshot save/load. */
  private def withDirListing[A](f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  def list(): Vector[Position] = withDirListing {
    _.filter(_.getFileName.toString.startsWith("snap-"))
      .flatMap(p => readHeader(p))
      .toVector
  }

  private def readHeader(p: Path): Option[Position] =
    try Some(SchemaSnapshotCodec.decodeHeader(Files.readAllBytes(p)))
    catch { case _: Exception => None }

  private def read(pos: Position): (Position, Vector[String], Vector[TableDef]) =
    SchemaSnapshotCodec.decode(Files.readAllBytes(fileFor(pos)))

  private def purge(): Unit = {
    val cutoff = java.time.Instant.now().minus(java.time.Duration.ofDays(purgeAfterDays.toLong))
    // never delete each server_id's NEWEST snapshot, however old (the
    // MysqlSnapshotStorage twin's MAX(id) guard): a pipeline idle past the
    // purge window would otherwise lose its only restorable snapshot on the
    // next save. Per server_id, not global — load()/ddlTail filter by
    // server_id, so after a failover the OLD server's last snapshot must
    // survive or positions on that server stop being restorable. The
    // filename leads with the zero-padded server_id (fixed 20 digits at
    // offset 5), so grouping by that prefix and taking the lexicographic
    // max within each group finds each server's newest.
    val newestPerServer = withDirListing {
      _.filter(_.getFileName.toString.startsWith("snap-"))
        .map(_.getFileName.toString).toVector
    }.groupBy(n => n.slice(5, 25)).values.map(_.max).toSet
    withDirListing {
      _.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("snap-") && !newestPerServer.contains(n)
      }
        .filter(p => Files.getLastModifiedTime(p).toInstant.isBefore(cutoff))
        .toVector
    }.foreach(Files.deleteIfExists(_))
  }

  /** Drop log lines no restore can ever replay: a tail replays only on top
    * of a loaded snapshot, and load() returns the newest snapshot at-or-
    * below the resume point — so lines at-or-below each server's OLDEST
    * retained snapshot are dead (any load that succeeds returns a snapshot
    * at-or-above them). Runs after every full snapshot write, bounding the
    * log at O(snapshots-in-retention × cadence) lines instead of growing
    * for the pipeline's lifetime. Torn/duplicate lines below the bound go
    * with it; the rewrite is atomic (tmp + move). */
  private def compactLog(): Unit = {
    if (!Files.isRegularFile(ddlLog)) return
    val oldest: Map[Long, Position] =
      list().groupBy(_.serverId).map { case (sid, ps) =>
        sid -> ps.reduceLeft((a, b) => if (a.compare(b) <= 0) a else b)
      }
    val kept = Files.readAllLines(ddlLog, UTF_8).asScala.filter { line =>
      line.split('\t') match {
        case Array(sid, name, p, _, _) =>
          try {
            val pos = Position(name, p.toLong, sid.toLong)
            oldest.get(pos.serverId).forall(o => pos.compare(o) > 0)
          } catch { case _: Exception => false }
        case _ => false
      }
    }
    val tmp = dir.resolve("ddl.log.tmp")
    Files.write(tmp, (kept.mkString("\n") + (if (kept.nonEmpty) "\n" else ""))
      .getBytes(UTF_8))
    Files.move(tmp, ddlLog, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
