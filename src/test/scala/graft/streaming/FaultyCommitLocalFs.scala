package graft.streaming

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only posix filesystem (`faultposix://` = RawLocalFileSystem, i.e.
  * genuinely NOT atomic-at-close) whose create streams can be armed to
  * throw on the first byte written to any COMMIT-OBJECT name (`c=<N>` or
  * its `.tmp`) — the deterministic stand-in for a SIGKILL between the
  * commit object's create and its close.
  *
  * This is the exact window the round-15 verdict's top finding named: the
  * object committer forced onto a posix root used to publish its commit
  * object via a bare `create(dst, overwrite=false)` + write + close, so a
  * kill in this window stranded a torn `c=<N>` at its FINAL name. With the
  * scheme-matched publish, the same kill can only ever tear the `.tmp`
  * sibling — the final name is reached exclusively by atomic rename. The
  * SnapshotStoreObjectCommitterSpec drives a real `writeNext` through this
  * filesystem with the fault armed and asserts exactly that.
  *
  * The fault pattern deliberately matches ONLY commit-object names, so the
  * parquet data job underneath runs normally. */
class FaultyCommitLocalFs extends RawLocalFileSystem {

  override def getScheme: String = FaultyCommitLocalFs.Scheme

  override def getUri: URI = URI.create(s"${FaultyCommitLocalFs.Scheme}:///")

  private def guarded(f: Path, out: FSDataOutputStream): FSDataOutputStream =
    if (!FaultyCommitLocalFs.armed.get() ||
      !f.getName.matches("c=\\d+(\\.tmp)?")) out
    else new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      private def boom(): Nothing = {
        // the stream stays open and the file stays at whatever the create
        // call left it (empty) — the post-SIGKILL on-disk state
        throw new IOException(
          s"faultposix: injected kill between create and close of $f")
      }
      override def write(b: Int): Unit = boom()
      override def write(b: Array[Byte], off: Int, len: Int): Unit = boom()
    }, null)

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    guarded(f, super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    guarded(f, super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress))

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    guarded(f, super.createNonRecursive(f, permission, flags, bufferSize,
      replication, blockSize, progress))
}

/** `AbstractFileSystem` binding so `FileContext` (which
  * [[SnapshotStore.publishSmallExclusive]]'s exclusive rename goes
  * through) resolves the scheme too — bind as
  * `fs.AbstractFileSystem.faultposix.impl`. */
class FaultyCommitAbstractFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new FaultyCommitLocalFs(), conf, FaultyCommitLocalFs.Scheme, false)

object FaultyCommitLocalFs {
  val Scheme = "faultposix"
  val ImplConfKey = s"fs.$Scheme.impl"
  val AbstractImplConfKey = s"fs.AbstractFileSystem.$Scheme.impl"
  val ImplClass: String = classOf[FaultyCommitLocalFs].getName
  val AbstractImplClass: String = classOf[FaultyCommitAbstractFs].getName

  /** Arm/disarm the commit-object write fault (shared across the FS cache's
    * instances). */
  val armed = new AtomicBoolean(false)
}
