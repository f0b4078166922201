package graft.cdc

import org.apache.zookeeper.server.{NIOServerCnxnFactory, ZooKeeperServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.net.InetSocketAddress
import java.nio.file.Files

/** ZooKeeper checkpoint storage against a real (embedded) ZK server —
  * persist → restart (fresh session) → resume, the HA deployment's
  * checkpoint path (/root/reference/ckp/storage_zookeeper.go:60-82). */
class ZkCkpStorageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var factory: NIOServerCnxnFactory = _
  private var hosts: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("zk-ckp").toFile
    val zks = new ZooKeeperServer(dir, dir, 2000)
    factory = new NIOServerCnxnFactory()
    factory.configure(new InetSocketAddress("127.0.0.1", 0), 64)
    factory.startup(zks)
    hosts = s"127.0.0.1:${factory.getLocalPort}"
  }

  override def afterAll(): Unit = if (factory != null) factory.shutdown()

  test("save/load round-trip; empty node means no checkpoint") {
    val s = new ZkCkpStorage(hosts, "/graft/ckp/a")
    try {
      assert(s.load().isEmpty) // freshly created, empty
      s.save("hello".getBytes("UTF-8"))
      assert(new String(s.load().get, "UTF-8") == "hello")
      s.save("world".getBytes("UTF-8"))
      assert(new String(s.load().get, "UTF-8") == "world")
    } finally s.close()
  }

  test("CkpManager over ZK: persist, restart with a fresh session, resume") {
    val a = new ZkCkpStorage(hosts, "/graft/ckp/mgr")
    try {
      val m = new CkpManager(a)
      m.update("kafka", Checkpoint(
        Progress(Position("mysql-bin.000002", 1000, 7),
          Some(GtidSet.parse("cb477437-aacb-11e8-90e7-0242ac110002:1-10"))),
        Map.empty).withIntCtx("acked_seq", 42))
      m.update("stdout", Checkpoint(Progress(Position("mysql-bin.000002", 900, 7), None)))
      m.persist()
    } finally a.close()

    // a different process (fresh ZK session) resumes from the same znode
    val b = new ZkCkpStorage(hosts, "/graft/ckp/mgr")
    try {
      val m2 = new CkpManager(b)
      assert(m2.names == Vector("kafka", "stdout"))
      assert(m2.get("kafka").get.getIntCtx("acked_seq", 0) == 42)
      assert(m2.getMinProgress == Progress(Position("mysql-bin.000002", 900, 7), None))
    } finally b.close()
  }

  test("forUri selects zk vs file storage") {
    val zk = CkpStorage.forUri(s"zk://$hosts/graft/ckp/uri")
    try {
      zk.save("z".getBytes("UTF-8"))
      assert(zk.isInstanceOf[ZkCkpStorage])
      assert(new String(zk.load().get, "UTF-8") == "z")
    } finally zk.asInstanceOf[ZkCkpStorage].close()
    val dir = Files.createTempDirectory("ckp-uri")
    val f = CkpStorage.forUri(dir.toString)
    assert(f.isInstanceOf[FileCkpStorage])
    f.save("x".getBytes("UTF-8"))
    assert(new String(f.load().get, "UTF-8") == "x")
  }
}
