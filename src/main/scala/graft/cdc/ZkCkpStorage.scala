package graft.cdc

import org.apache.zookeeper.{CreateMode, KeeperException, WatchedEvent, ZooDefs, ZooKeeper}
import org.apache.zookeeper.Watcher.Event.KeeperState

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** ZooKeeper checkpoint storage — the HA twin of the dual-file store
  * (/root/reference/ckp/storage_zookeeper.go:27-104): one znode holds the
  * serialized checkpoint blob; save = setData (ZK writes are atomic, so no
  * ping-pong needed), load = getData, missing/empty node = no checkpoint.
  * The node (and its parents) are created on construction. Uses the same
  * classpath ZK client the election (T9) already proves out.
  *
  * A long-running pipeline survives ZK blips: `ConnectionLoss` retries with
  * backoff against the same handle (the client library reconnects within
  * the session timeout), and `SessionExpired` rebuilds the handle — without
  * this, one expired session would fail every subsequent save() until the
  * process restarts (the reference's go-zookeeper client reconnects
  * transparently inside `conn.SetData`).
  */
final class ZkCkpStorage(hosts: String, path: String, sessionTimeoutMs: Int = 40000)
    extends CkpStorage with AutoCloseable {

  @volatile private var zk: ZooKeeper = connect()
  private var closed = false

  private def connect(): ZooKeeper = {
    val connected = new CountDownLatch(1)
    val z = new ZooKeeper(hosts, sessionTimeoutMs, (e: WatchedEvent) => {
      if (e.getState == KeeperState.SyncConnected) connected.countDown()
    })
    require(connected.await(10, TimeUnit.SECONDS), s"zookeeper connect timeout to $hosts")
    z
  }

  /** Rebuild the handle after a session expiry (old session's ephemeral
    * state is gone server-side; the old handle is permanently dead). */
  private def rebuild(): Unit = synchronized {
    if (closed) throw new IllegalStateException("storage closed")
    try zk.close() catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    zk = connect()
  }

  /** Retry loop shared by save/load: ConnectionLoss → backoff + retry on
    * the same handle; SessionExpired → rebuild the handle and retry. The
    * retry window is time-based and COVERS the session timeout (1.5×):
    * the client library reconnects on its own anywhere inside that
    * timeout, so an attempt budget that gives up after a couple of
    * seconds would abandon blips the session itself survives. A hard
    * outage still surfaces once the deadline passes. A failed rebuild
    * attempt (ensemble still unreachable) is swallowed and retried — it
    * must not abort the loop with a foreign exception type. */
  private def withRetry[A](op: ZooKeeper => A): A = {
    val deadlineNs = System.nanoTime() + sessionTimeoutMs.toLong * 1500000L
    var backoffMs = 100L
    while (true) {
      try return op(zk)
      catch {
        case e: KeeperException.SessionExpiredException =>
          if (System.nanoTime() > deadlineNs) throw e
          try rebuild()
          catch {
            case _: IllegalArgumentException | _: KeeperException => ()
            case ie: InterruptedException => throw ie
          }
          Thread.sleep(backoffMs); backoffMs = math.min(backoffMs * 2, 5000L)
        case e: KeeperException.ConnectionLossException =>
          if (System.nanoTime() > deadlineNs) throw e
          Thread.sleep(backoffMs); backoffMs = math.min(backoffMs * 2, 5000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Create the full path chain (parents included); NodeExists is fine. */
  private def ensurePath(z: ZooKeeper): Unit = {
    val parts = path.split('/').filter(_.nonEmpty)
    var cur = ""
    parts.foreach { seg =>
      cur = s"$cur/$seg"
      try z.create(cur, Array.emptyByteArray, ZooDefs.Ids.OPEN_ACL_UNSAFE,
        CreateMode.PERSISTENT)
      catch { case _: KeeperException.NodeExistsException => () }
    }
  }

  locally { withRetry(ensurePath) }

  override def save(data: Array[Byte]): Unit =
    withRetry { z =>
      try z.setData(path, data, -1)
      catch {
        case _: KeeperException.NoNodeException =>
          // node vanished (e.g. rebuilt against a wiped ensemble):
          // recreate the WHOLE chain — the parents are gone too in that
          // scenario, and a leaf-only create would just NoNode again
          ensurePath(z)
          z.setData(path, data, -1)
      }
    }

  override def load(): Option[Array[Byte]] = {
    val data = withRetry { z =>
      try z.getData(path, false, null)
      catch { case _: KeeperException.NoNodeException => null }
    }
    Option(data).filter(_.nonEmpty)
  }

  override def close(): Unit = synchronized {
    closed = true
    zk.close()
  }
}
