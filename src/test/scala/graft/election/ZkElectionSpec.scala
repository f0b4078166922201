package graft.election

import graft.cdc.{DdlGate, SchemaTracker}
import graft.http.AdminServer
import graft.metrics.Counters
import org.apache.zookeeper.server.{NIOServerCnxnFactory, ZooKeeperServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.TimeUnit

/** T9 against a real (embedded) ZooKeeper server: first candidate leads,
  * followers watch their predecessor, leader death promotes the next
  * candidate with a notification, and /status reports the role — the
  * reference's leader/follower flow (cmd/dolphinbeat/app.go:325-392,
  * http_handler.go:68-92). */
class ZkElectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var factory: NIOServerCnxnFactory = _
  private var hosts: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("zk-spec").toFile
    val zks = new ZooKeeperServer(dir, dir, 2000)
    factory = new NIOServerCnxnFactory()
    factory.configure(new InetSocketAddress("127.0.0.1", 0), 64)
    factory.startup(zks)
    hosts = s"127.0.0.1:${factory.getLocalPort}"
  }

  override def afterAll(): Unit = if (factory != null) factory.shutdown()

  test("first candidate leads; second follows; leader death promotes the follower") {
    val a = new ZkElection(hosts, "/graft/election", "node-a").start()
    try {
      assert(a.notifications.poll(5, TimeUnit.SECONDS) == true)
      assert(a.isLeader)
      assert(a.mode == "leader")

      val b = new ZkElection(hosts, "/graft/election", "node-b").start()
      try {
        assert(!b.isLeader)
        assert(b.mode == "follower")
        assert(b.leaderValue.contains("node-a"))

        // leader resigns (session close drops the ephemeral node)
        a.close()
        assert(b.notifications.poll(10, TimeUnit.SECONDS) == true,
          "follower should be notified of promotion")
        assert(b.isLeader)
        assert(b.leaderValue.contains("node-b"))
      } finally b.close()
    } finally a.close()
  }

  test("independent election paths do not interfere") {
    val a = new ZkElection(hosts, "/graft/e1", "a").start()
    val b = new ZkElection(hosts, "/graft/e2", "b").start()
    try {
      assert(a.isLeader && b.isLeader)
    } finally { a.close(); b.close() }
  }

  test("/status reports the election role, like the reference") {
    val el = new ZkElection(hosts, "/graft/status-election", "admin-node").start()
    val srv = new AdminServer(new SchemaTracker, new DdlGate(new SchemaTracker),
      new Counters, mode = () => el.mode, port = 0).start()
    try {
      val res = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${srv.boundPort}/status")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(res.body().contains("\"mode\":\"leader\""))
    } finally { srv.stop(); el.close() }
  }
}
