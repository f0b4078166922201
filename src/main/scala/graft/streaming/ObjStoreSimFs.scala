package graft.streaming

import java.io.{File, IOException, OutputStream}
import java.net.URI
import java.nio.file.{Files, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Simulated object store for offline testing of the [[SnapshotStore]]
  * object-store commit protocol — a Hadoop `FileSystem` over local disk
  * that models the semantics of S3-class stores (with conditional PUT)
  * instead of POSIX:
  *
  *  - **PUT is atomic and all-or-nothing**: `create` buffers to a hidden
  *    sibling and the object becomes visible ONLY at `close()` — a reader
  *    can never observe a half-written object, and a crash mid-write
  *    leaves nothing at the destination (exactly S3's PUT contract).
  *  - **Conditional create (If-None-Match)**: `create(f, overwrite=false)`
  *    publishes via an atomic hard-link, so of two concurrent writers
  *    exactly one wins and the loser gets `FileAlreadyExistsException` at
  *    close — the primitive the object-store committer's commit-object
  *    publish relies on.
  *  - **Rename is copy+delete and NOT atomic**: each object copies
  *    atomically (a COPY is a PUT), but a multi-object "directory rename"
  *    is a non-atomic batch that can be interrupted between objects,
  *    leaving both partial destination and intact source — the failure
  *    mode that makes rename-based commit protocols unsafe on object
  *    stores. [[ObjStoreSimFs.failRenameAfterObjects]] injects that
  *    interruption deterministically, and a rename onto an existing
  *    destination is refused (no POSIX replace, no HDFS move-into-dir).
  *
  * Register with `spark.hadoop.fs.objsim.impl = graft.streaming.ObjStoreSimFs`
  * and address paths as `objsim:///abs/path`. Specs and the driver-loss
  * drill point state roots here to prove the committer's crash story
  * without cloud credentials; the scheme is listed in
  * [[SnapshotStore.NonAtomicRenameSchemes]] so the committer selection
  * treats it exactly like s3a/gs/abfs.
  */
class ObjStoreSimFs extends RawLocalFileSystem {

  override def getScheme: String = ObjStoreSimFs.Scheme

  override def getUri: URI = URI.create(s"${ObjStoreSimFs.Scheme}:///")

  /** Whether exclusive create is a TRUE atomic arbiter (hard-link publish,
    * modeling S3 If-None-Match). [[WeakCreateSimFs]] overrides to false to
    * model the classic-S3A shape: `overwrite=false` degraded to a HEAD
    * pre-check (check-then-act) with a plain last-writer-wins PUT — the
    * FileSystem the [[SnapshotStore.requireExclusiveCreate]] gate exists
    * to refuse. */
  protected def conditionalCreateSupported: Boolean = true

  /** Advertises the conditional-create path capability when the arbiter
    * is real — what [[SnapshotStore.requireExclusiveCreate]] probes. */
  override def hasPathCapability(path: Path, capability: String): Boolean =
    if (capability == SnapshotStore.ConditionalCreateCapability)
      conditionalCreateSupported
    else super.hasPathCapability(path, capability)

  /** Atomic-PUT create: write to a hidden sibling, publish at close.
    * Exclusive mode (`overwrite=false`) publishes by hard-link, the
    * filesystem-level arbiter of If-None-Match. */
  private def putStream(f: Path, overwrite: Boolean): FSDataOutputStream = {
    val dst = pathToFile(f).toPath
    if (dst.getParent != null) Files.createDirectories(dst.getParent)
    if (!overwrite && Files.exists(dst))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"object already exists (If-None-Match): $f")
    val tmp = dst.resolveSibling(
      "." + dst.getFileName + ".put." + java.util.UUID.randomUUID)
    val raw = Files.newOutputStream(tmp)
    val publishing: OutputStream = new java.io.FilterOutputStream(raw) {
      // FilterOutputStream degrades bulk writes to byte-at-a-time — forward
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        raw.write(b, off, len)
      override def close(): Unit = {
        super.close()
        if (overwrite || !conditionalCreateSupported)
          // plain PUT — in weak mode an exclusive create that passed the
          // pre-check above publishes WITHOUT an arbiter (last writer wins),
          // exactly the check-then-act window the capability gate refuses
          Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        else {
          try Files.createLink(dst, tmp)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp)
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"object was created concurrently (If-None-Match lost): $f")
          }
          Files.deleteIfExists(tmp)
        }
      }
    }
    new FSDataOutputStream(publishing, statistics)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = putStream(f, overwrite)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = putStream(f, overwrite)

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    putStream(f, flags.contains(org.apache.hadoop.fs.CreateFlag.OVERWRITE))

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new IOException("objsim: append is not supported on object stores")

  /** Copy+delete rename. Per-object copies are atomic (a COPY is a PUT),
    * but the batch is interruptible between objects — the injected-crash
    * seam — and the source delete phase follows only after every copy. */
  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) return false
    if (d.exists()) return false // no replace, no HDFS-style move-into-dir
    ObjStoreSimFs.renameLog.add(s"$src -> $dst")
    if (d.getParentFile != null) Files.createDirectories(d.getParentFile.toPath)
    copyTree(s, d)
    deleteTree(s)
    true
  }

  private def copyTree(s: File, d: File): Unit =
    if (s.isDirectory) {
      Files.createDirectories(d.toPath)
      s.listFiles().foreach(c => copyTree(c, new File(d, c.getName)))
    } else {
      val n = ObjStoreSimFs.failRenameAfterObjects.get()
      if (n >= 0 && ObjStoreSimFs.copiedObjects.incrementAndGet() > n)
        throw new IOException(
          s"objsim: injected crash mid-rename after $n object copies " +
            s"(partial destination left at ${d.getParent})")
      val tmp = d.toPath.resolveSibling(
        "." + d.getName + ".copy." + java.util.UUID.randomUUID)
      Files.copy(s.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, d.toPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

  private def deleteTree(s: File): Unit = {
    if (s.isDirectory) s.listFiles().foreach(deleteTree)
    Files.deleteIfExists(s.toPath)
  }
}

/** [[ObjStoreSimFs]] WITHOUT the conditional-create arbiter — models the
  * classic-S3A object store whose `create(path, overwrite=false)` is a
  * HEAD pre-check followed by an unconditional PUT (check-then-act): two
  * writers passing the pre-check together both "win", last PUT silently
  * overwrites. Advertises NO conditional-create capability, so
  * [[SnapshotStore.requireExclusiveCreate]] must refuse roots on this
  * scheme unless `spark.graft.snapshot.assumeConditionalCreate=true`
  * acknowledges the window — the spec-pinned contract. */
class WeakCreateSimFs extends ObjStoreSimFs {
  override def getScheme: String = ObjStoreSimFs.WeakScheme
  override def getUri: URI = URI.create(s"${ObjStoreSimFs.WeakScheme}:///")
  override protected def conditionalCreateSupported: Boolean = false
}

object ObjStoreSimFs {
  val Scheme = "objsim"

  /** Scheme of the check-then-act variant ([[WeakCreateSimFs]]). */
  val WeakScheme = "objweak"

  /** Hadoop conf binding for the scheme — set on the SparkSession as
    * `spark.hadoop.` + this. */
  val ImplConfKey = s"fs.$Scheme.impl"
  val ImplClass: String = classOf[ObjStoreSimFs].getName

  /** Conf binding for the weak-create variant's scheme. */
  val WeakImplConfKey = s"fs.$WeakScheme.impl"
  val WeakImplClass: String = classOf[WeakCreateSimFs].getName

  /** Crash injection: when ≥ 0, the (N+1)-th object copied by any rename
    * throws, leaving a partial destination. −1 disables. Reset via
    * [[armRenameFailure]] / [[disarmRenameFailure]]. */
  val failRenameAfterObjects = new AtomicInteger(-1)
  private val copiedObjects = new AtomicInteger(0)

  def armRenameFailure(afterObjects: Int): Unit = {
    copiedObjects.set(0)
    failRenameAfterObjects.set(afterObjects)
  }

  def disarmRenameFailure(): Unit = failRenameAfterObjects.set(-1)

  /** Audit log of every rename routed through the simulated store ("src ->
    * dst"), for asserting the committer's publish step never renames. */
  val renameLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
