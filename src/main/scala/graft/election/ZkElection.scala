package graft.election

import org.apache.zookeeper.{CreateMode, KeeperException, WatchedEvent, Watcher, ZooDefs, ZooKeeper}
import org.apache.zookeeper.Watcher.Event.{EventType, KeeperState}

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}
import scala.jdk.CollectionConverters._

/** T9 — HA leader election over ZooKeeper, the reference's election model
  * (/root/reference/cmd/dolphinbeat/app.go:116-129 wires
  * bytewatch/election with ZkHosts/ZkPath/Lease over go-zookeeper;
  * app.go:325-392 consumes IsLeader()/Notify()/Err()).
  *
  * Standard ephemeral-sequential recipe: each candidate creates
  * `<path>/member-NNNNNNNNNN` (ephemeral, sequential); the smallest
  * sequence is the leader; every follower watches only its immediate
  * predecessor (no herd effect). Session loss surfaces on `errors` — the
  * caller must stop producing, exactly the reference's fatal-error path.
  *
  * The pipeline reads `isLeader` before producing and `notifications` to react to
  * role changes; `leaderValue` exposes the current leader's payload (host
  * identity) for /status.
  */
final class ZkElection(
    hosts: String,
    path: String,
    value: String,
    sessionTimeoutMs: Int = 6000) {

  @volatile private var leader = false
  @volatile private var closed = false
  private var zk: ZooKeeper = _
  private var myNode: String = _ // full path of our member node

  /** Role-change notifications (the reference's Notify() channel). */
  val notifications = new LinkedBlockingQueue[java.lang.Boolean]()
  /** Fatal session errors (the reference's Err() channel). */
  val errors = new LinkedBlockingQueue[String]()

  private val watcher = new Watcher {
    override def process(e: WatchedEvent): Unit = {
      if (e.getState == KeeperState.Expired || e.getState == KeeperState.Closed) {
        if (!closed) {
          val wasLeader = leader
          leader = false
          // demotion must surface on the ROLE channel too — a caller
          // following the class doc polls notifications, and a silent
          // errors-only demotion would leave it acting as leader
          if (wasLeader) notifications.offer(false)
          errors.offer(s"zookeeper session lost: ${e.getState}")
        }
      } else if (e.getType == EventType.NodeDeleted) {
        // predecessor went away — re-evaluate our position
        if (!closed) evaluate()
      }
    }
  }

  def start(): ZkElection = {
    val connected = new CountDownLatch(1)
    zk = new ZooKeeper(hosts, sessionTimeoutMs, (e: WatchedEvent) => {
      if (e.getState == KeeperState.SyncConnected) connected.countDown()
      watcher.process(e)
    })
    require(connected.await(10, TimeUnit.SECONDS), s"zookeeper connect timeout to $hosts")
    ensurePath(path)
    myNode = zk.create(s"$path/member-", value.getBytes(UTF_8),
      ZooDefs.Ids.OPEN_ACL_UNSAFE, CreateMode.EPHEMERAL_SEQUENTIAL)
    evaluate()
    this
  }

  private def ensurePath(p: String): Unit = {
    val parts = p.split('/').filter(_.nonEmpty)
    var cur = ""
    parts.foreach { seg =>
      cur = s"$cur/$seg"
      try zk.create(cur, Array.emptyByteArray, ZooDefs.Ids.OPEN_ACL_UNSAFE,
        CreateMode.PERSISTENT)
      catch { case _: KeeperException.NodeExistsException => () }
    }
  }

  private def seqOf(node: String): Long = node.drop("member-".length).toLong

  private def evaluate(): Unit = synchronized {
    if (closed) return
    try {
      val children = zk.getChildren(path, false).asScala.toVector.sortBy(seqOf)
      val mine = myNode.substring(path.length + 1)
      val idx = children.indexOf(mine)
      if (idx < 0) { // our node vanished (session reset): fatal
        val wasLeader = leader
        leader = false
        if (wasLeader) notifications.offer(false)
        errors.offer("election node lost")
        return
      }
      val wasLeader = leader
      if (idx == 0) {
        leader = true
        if (!wasLeader) notifications.offer(true)
      } else {
        leader = false
        if (wasLeader) notifications.offer(false)
        // watch ONLY the immediate predecessor
        val pred = s"$path/${children(idx - 1)}"
        if (zk.exists(pred, watcher) == null) evaluate() // raced: gone already
      }
    } catch {
      case _: KeeperException =>
        // transient (e.g. ConnectionLoss with a surviving session): the
        // predecessor watch was NOT registered, so giving up here would
        // wedge this candidate out of the failover set forever. Retry
        // off-thread until closed; a real session expiry surfaces via
        // the watcher's Expired path, not here.
        if (!closed) {
          val t = new Thread(() => {
            try { Thread.sleep(500); evaluate() }
            catch { case _: InterruptedException => () }
          }, "zk-election-retry")
          t.setDaemon(true)
          t.start()
        }
      case _: InterruptedException => ()
    }
  }

  def isLeader: Boolean = leader

  /** The payload of the current leader's node (for /status inspection). */
  def leaderValue: Option[String] =
    try {
      val children = zk.getChildren(path, false).asScala.toVector.sortBy(seqOf)
      children.headOption.map(c => new String(zk.getData(s"$path/$c", false, null), UTF_8))
    } catch { case _: KeeperException => None }

  /** /status mode string, the reference's leader/follower/standalone. */
  def mode: String = if (isLeader) "leader" else "follower"

  def close(): Unit = {
    closed = true
    leader = false
    if (zk != null) zk.close()
  }
}
