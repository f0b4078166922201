package graft.http

import graft.cdc._
import graft.metrics.{Counters, GraftStreamingListener}
import graft.streaming.Replay
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/** The reference's admin workflow, driven end-to-end over HTTP
  * (/root/reference/cmd/dolphinbeat/http.go:30-54 routes,
  * http_handler.go:68-166 handlers): schema inspection, the T7 DDL
  * park → inspect → exec → retry repair loop, Prometheus metrics, status. */
class AdminServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, form: String = ""): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def withServer(f: (Int, SchemaTracker, DdlGate, Counters) => Unit): Unit = {
    val tracker = new SchemaTracker
    val counters = new Counters
    val gate = new DdlGate(tracker, onPark = () => counters.failedDdlTotal.inc())
    val srv = new AdminServer(tracker, gate, counters, port = 0).start()
    try f(srv.boundPort, tracker, gate, counters)
    finally srv.stop()
  }

  test("status reports mode standalone") {
    withServer { (port, _, _, _) =>
      val res = get(port, "/status")
      assert(res.statusCode() == 200)
      assert(res.body().contains("\"mode\":\"standalone\""))
      assert(res.body().contains("\"version\""))
    }
  }

  test("schema endpoints walk databases -> tables -> table def") {
    withServer { (port, tracker, gate, _) =>
      assert(gate.apply("CREATE DATABASE shop", ""))
      assert(gate.apply("CREATE TABLE orders (id INT UNSIGNED NOT NULL, note VARCHAR(64))", "shop"))

      assert(get(port, "/schema").body() == "[\"shop\"]")
      assert(get(port, "/schema/shop").body() == "[\"orders\"]")
      val t = get(port, "/schema/shop/orders")
      assert(t.statusCode() == 200)
      assert(t.body().contains("\"name\":\"orders\""))
      assert(t.body().contains("\"name\":\"id\""))
      assert(t.body().contains("\"unsigned\":true"))
      assert(get(port, "/schema/shop/missing").statusCode() == 400)
    }
  }

  test("T7 repair loop over HTTP: park -> inspect -> exec -> retry") {
    withServer { (port, tracker, gate, counters) =>
      assert(gate.apply("CREATE DATABASE shop", ""))
      // ALTER on a table that does not exist parks the pipeline
      assert(!gate.apply("ALTER TABLE orders ADD COLUMN qty INT", "shop"))
      assert(counters.failedDdlTotal.get == 1)

      val failed = get(port, "/ddl/failed")
      assert(failed.statusCode() == 200)
      assert(failed.body().contains("\"statement\":\"ALTER TABLE orders ADD COLUMN qty INT\""))
      assert(failed.body().contains("\"db\":\"shop\""))
      assert(failed.body().contains("tips"))

      // operator repairs the mirror: create the missing table via /ddl/exec
      val exec = post(port, "/ddl/exec",
        "statement=" + java.net.URLEncoder.encode("CREATE TABLE orders (id INT)", "UTF-8") +
          "&db=shop")
      assert(exec.statusCode() == 200, exec.body())

      // retry the parked ALTER: now applies, gate unparks
      assert(post(port, "/ddl/retry").statusCode() == 200)
      assert(!gate.isParked)
      assert(tracker.getTableDef("shop", "orders").get.columns.map(_.name) ==
        Vector("id", "qty"))
      // inspecting again: nothing parked (empty 200), retry again is a 400
      assert(get(port, "/ddl/failed").body().isEmpty)
      assert(post(port, "/ddl/retry").statusCode() == 400)
    }
  }

  test("exec without statement is a 400; skip clears a park") {
    withServer { (port, _, gate, _) =>
      assert(post(port, "/ddl/exec").statusCode() == 400)
      assert(post(port, "/ddl/skip").statusCode() == 400) // nothing parked
      assert(!gate.apply("NOT REALLY SQL AT ALL !!", "db"))
      assert(post(port, "/ddl/skip").statusCode() == 200)
      assert(!gate.isParked)
    }
  }

  test("/debug/threads dumps every live thread with its stack") {
    withServer { (port, _, _, _) =>
      val res = get(port, "/debug/threads")
      assert(res.statusCode() == 200)
      // the serving thread itself must appear, with frames
      assert(res.body().contains("RUNNABLE"))
      assert(res.body().contains("\tat "))
      assert(res.body().linesIterator.count(_.startsWith("\"")) >= 3)
    }
  }

  test("/debug/heap serves a class histogram (or pool usage fallback)") {
    withServer { (port, _, _, _) =>
      val res = get(port, "/debug/heap")
      assert(res.statusCode() == 200)
      // HotSpot: jmap -histo style lines; fallback: pool usage summary —
      // either way java.lang classes / heap numbers must show up
      assert(res.body().contains("java.lang") || res.body().contains("heap: used="))
      assert(res.body().nonEmpty)
    }
  }

  test("metrics expose A1 counters after a replay run, in Prometheus text format") {
    withServer { (port, _, _, counters) =>
      val spark = SparkSession.builder()
        .master("local[4]")
        .appName("admin-metrics-spec")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        spark.streams.addListener(new GraftStreamingListener(counters))
        val out = Files.createTempDirectory("admin-metrics")
        val stats = Replay.run(spark, Paths.get("fixtures/canal_test.jsonl"), out,
          counters = counters)
        assert(stats.emitted == 12)
        // fixture composition: 3 committed trx, 4 IUD row events, 1 DDL
        assert(counters.trxTotal.get == 3)
        assert(counters.iudTotal.get == 4)
        assert(counters.ddlTotal.get == 1)
        assert(counters.opsEmittedTotal.get == 12)
        // listener events arrive async on the listener bus
        val deadline = System.nanoTime() + 10_000_000_000L
        while (counters.streamBatchesTotal.get < 1 && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(counters.streamBatchesTotal.get >= 1) // listener bridge fired
        assert(counters.streamInputRowsTotal.get >= 12)

        val body = get(port, "/metrics").body()
        assert(body.contains("# TYPE trx_total counter"))
        assert(body.contains("trx_total 3"))
        assert(body.contains("iud_total 4"))
        assert(body.contains("ops_emitted_total 12"))
      } finally spark.stop()
    }
  }
}
