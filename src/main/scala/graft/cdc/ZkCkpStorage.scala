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
  */
final class ZkCkpStorage(hosts: String, path: String, sessionTimeoutMs: Int = 40000)
    extends CkpStorage with AutoCloseable {

  private val zk: ZooKeeper = {
    val connected = new CountDownLatch(1)
    val z = new ZooKeeper(hosts, sessionTimeoutMs, (e: WatchedEvent) => {
      if (e.getState == KeeperState.SyncConnected) connected.countDown()
    })
    require(connected.await(10, TimeUnit.SECONDS), s"zookeeper connect timeout to $hosts")
    z
  }

  locally {
    val parts = path.split('/').filter(_.nonEmpty)
    var cur = ""
    parts.foreach { seg =>
      cur = s"$cur/$seg"
      try zk.create(cur, Array.emptyByteArray, ZooDefs.Ids.OPEN_ACL_UNSAFE,
        CreateMode.PERSISTENT)
      catch { case _: KeeperException.NodeExistsException => () }
    }
  }

  override def save(data: Array[Byte]): Unit = zk.setData(path, data, -1)

  override def load(): Option[Array[Byte]] = {
    val data =
      try zk.getData(path, false, null)
      catch { case _: KeeperException.NoNodeException => null }
    Option(data).filter(_.nonEmpty)
  }

  override def close(): Unit = zk.close()
}
