package graft.streaming

import graft.cdc._
import org.apache.spark.sql.SparkSession
import org.apache.zookeeper.server.{NIOServerCnxnFactory, ZooKeeperServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Single-file deployment config: the TOML-subset decoder against the
  * reference's sample shape (cmd/dolphinbeat/dolphinbeat.toml.sample), and
  * a two-sink replay wired ENTIRELY from one config file — per-sink
  * filters, ZooKeeper checkpoints, election, admin port; no env vars. */
class AppConfigSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var factory: NIOServerCnxnFactory = _
  private var zkHosts: String = _
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("appconfig-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("zk-cfg").toFile
    val zks = new ZooKeeperServer(dir, dir, 2000)
    factory = new NIOServerCnxnFactory()
    factory.configure(new InetSocketAddress("127.0.0.1", 0), 64)
    factory.startup(zks)
    zkHosts = s"127.0.0.1:${factory.getLocalPort}"
  }

  override def afterAll(): Unit = {
    spark.stop()
    if (factory != null) factory.shutdown()
  }

  test("decodes the reference-shaped sample: scalars, sections, sink tables") {
    val cfg = AppConfig.parse("""
      |# MySQL address, user and password
      |mysql_addr = "172.17.0.2:3306"
      |mysql_user = "root"
      |mysql_password = ""
      |flavor = "mysql"
      |gtid_enabled = true
      |server_id = 1001
      |
      |[http_server]
      |  addr = ":8080"
      |
      |[election]
      |  enabled = false
      |  zk_hosts = "172.17.0.2:2181"
      |  zk_path = "/dolphinbeat/nodes"
      |  lease = 40
      |
      |[checkpoint]
      |  interval = 10
      |  storage = "zookeeper"
      |  zk_hosts = "172.17.0.2:2181"
      |  zk_path = "/dolphinbeat/ckp"
      |
      |[[sink]]
      |  enabled=true
      |  type="stdout"
      |  name="test_stdout"
      |  include_table=["test\\..*"]
      |  exclude_table=[]
      |  [sink.cfg]
      |    encoder="json"
      |
      |[[sink]]
      |  enabled=true
      |  type="kafka"
      |  name="test_kafka"
      |  include_table=["test\\..*", "shop\\..*"]
      |  exclude_table=["test\\.tmp_.*"]
      |  [sink.cfg]
      |    broker_list="172.17.0.2:9092"
      |    topic="my_topic"
      |    max_payload_size=1048576
      |
      |[[sink]]
      |  enabled=false
      |  type="stdout"
      |  name="disabled_one"
      |""".stripMargin)

    assert(cfg.mysqlAddr.contains("172.17.0.2:3306"))
    assert(cfg.gtidEnabled)
    assert(cfg.serverId == 1001)
    assert(cfg.adminPort.contains(8080))
    assert(!cfg.electionEnabled)
    assert(cfg.electionZkPath == "/dolphinbeat/nodes")
    assert(cfg.ckpUri.contains("zk://172.17.0.2:2181/dolphinbeat/ckp"))
    assert(cfg.sinks.size == 3)
    assert(cfg.enabledSinks.map(_.name) == Seq("test_stdout", "test_kafka"))
    val kafka = cfg.sinkOfType("kafka").get
    assert(kafka.includeTable == Seq("test\\..*", "shop\\..*"))
    assert(kafka.excludeTable == Seq("test\\.tmp_.*"))
    assert(kafka.cfg("topic") == "my_topic")
    assert(kafka.cfg("max_payload_size") == "1048576")
    assert(cfg.sinkOfType("stdout").get.cfg("encoder") == "json")
  }

  test("array values inside [sink.cfg] are preserved (comma-joined), not dropped") {
    val cfg = AppConfig.parse("""
      |[[sink]]
      |  enabled=true
      |  type="kafka"
      |  name="k"
      |  [sink.cfg]
      |    broker_list=["b1:9092", "b2:9092"]
      |    topic="t"
      |""".stripMargin)
    val k = cfg.sinkOfType("kafka").get
    assert(k.cfg("broker_list") == "b1:9092,b2:9092")
    assert(k.cfg("topic") == "t")
  }

  test("file checkpoint storage config maps to the dual-file dir") {
    val cfg = AppConfig.parse(
      "[checkpoint]\n  storage = \"file\"\n  dir = \"/tmp/etc\"\n")
    assert(cfg.ckpUri.contains("/tmp/etc"))
  }

  test("two-sink replay wired from one config file alone: per-sink filters, " +
      "ZK checkpoints, election, admin") {
    spark // force session init so runFromConfig reuses it
    val out = Files.createTempDirectory("cfgrun")
    val toml = Files.createTempFile("graft", ".toml")
    Files.writeString(toml, s"""
      |server_id = 66693
      |
      |[replay]
      |  fixture = "fixtures/canal_test.jsonl"
      |  out_dir = "$out"
      |
      |[http_server]
      |  addr = ":18099"
      |
      |[election]
      |  enabled = true
      |  zk_hosts = "$zkHosts"
      |  zk_path = "/graft/cfg-election"
      |
      |[checkpoint]
      |  storage = "zookeeper"
      |  zk_hosts = "$zkHosts"
      |  zk_path = "/graft/cfg-ckp"
      |
      |[[sink]]
      |  enabled=true
      |  type="stdout"
      |  name="json_sink"
      |  include_table=[]
      |  exclude_table=["mysql\\\\..*"]
      |
      |[[sink]]
      |  enabled=true
      |  type="kafka"
      |  name="wire_sink"
      |  include_table=[]
      |  exclude_table=[]
      |""".stripMargin)

    Replay.runFromConfig(toml.toString)

    // stdout sink: mysql.* row events filtered by ITS config filter
    val jsonLines = Files.readAllLines(out.resolve("operations.jsonl")).asScala
    assert(jsonLines.nonEmpty)
    assert(!jsonLines.exists(_.contains("\"database\":\"mysql\"")))
    // wire sink: unfiltered — the mysql.canal_test insert is present
    val wire = Files.readAllLines(out.resolve("wire.b64l")).asScala
    assert(wire.nonEmpty)
    val dec = new OperationDecoder
    val ops = wire.zipWithIndex.flatMap { case (b64, i) =>
      dec.feed(java.util.Base64.getDecoder.decode(b64), i.toLong).toSeq.flatMap(_.ops)
    }
    assert(ops.exists(op => op.table.exists(_.database == "mysql")))

    // checkpoints landed in ZooKeeper (a fresh session sees them)
    val zk = new ZkCkpStorage(zkHosts, "/graft/cfg-ckp")
    try {
      val mgr = new CkpManager(zk)
      assert(mgr.names.toSet == Set("stdout", "wire"))
      assert(!mgr.getMinProgress.isZero)
    } finally zk.close()

    // a second run from the SAME config resumes from the ZK checkpoint:
    // everything is at-or-below it, so nothing re-emits (F3)
    val before = jsonLines.size
    Replay.runFromConfig(toml.toString)
    val after = Files.readAllLines(out.resolve("operations.jsonl")).asScala.size
    assert(after == before, "restart from ZK checkpoint must not re-emit")
  }
}
