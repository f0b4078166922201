package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.cdc.{ColumnDef, DdlGate, SchemaTracker, TableDef}
import graft.metrics.Counters

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

/** The operator's window into a running pipeline — the reference's HTTP
  * admin surface re-expressed on the JDK's built-in server (no deps):
  *
  *  - `GET /status` — version/mode (cmd/dolphinbeat/http_handler.go:68-92)
  *  - `GET /schema`, `/schema/{db}`, `/schema/{db}/{table}` — the tracked
  *    schema mirror (http_handler.go:94-123)
  *  - `GET /ddl/failed`, `POST /ddl/retry`, `POST /ddl/exec?statement=…`,
  *    `POST /ddl/skip` — the T7 park/repair loop (http_handler.go:124-166;
  *    routing table http.go:30-54)
  *  - `GET /metrics` — Prometheus text exposition (metrics.go:29-51)
  *
  * Errors are 400 + plain-text message, success 200 + JSON, matching the
  * reference's writeError/writeData pair. `port = 0` binds an ephemeral
  * port (tests).
  */
final class AdminServer(
    tracker: SchemaTracker,
    gate: DdlGate,
    counters: Counters,
    mode: () => String = () => "standalone",
    port: Int = 8080,
    progress: () => Option[String] = () => None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(null) // serve on the dispatch thread; admin traffic is tiny

  def boundPort: Int = server.getAddress.getPort

  def start(): AdminServer = { server.start(); this }
  def stop(): Unit = server.stop(0)

  // ---------- tiny JSON writer (strings/longs/arrays/objects) ----------

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
  private def jarr(items: Seq[String]): String = items.mkString("[", ",", "]")
  private def jobj(fields: (String, String)*): String =
    fields.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")

  private def columnJson(c: ColumnDef): String = jobj(
    "name" -> jstr(c.name),
    "sql_type" -> jstr(c.sqlType),
    "inner_type" -> c.innerType.toString,
    "key" -> jstr(c.key),
    "charset" -> jstr(c.charset),
    "unsigned" -> c.unsigned.toString,
    "nullable" -> c.nullable.toString)

  private def tableJson(t: TableDef): String = jobj(
    "database" -> jstr(t.database),
    "name" -> jstr(t.name),
    "charset" -> jstr(t.charset),
    "columns" -> jarr(t.columns.map(columnJson)))

  // ---------- request plumbing ----------

  private def respond(ex: HttpExchange, code: Int, body: String, json: Boolean): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      if (json) "application/json" else "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
    ex.close()
  }
  private def ok(ex: HttpExchange, json: String): Unit = respond(ex, 200, json, json = true)
  private def err(ex: HttpExchange, msg: String): Unit = respond(ex, 400, msg, json = false)

  /** Mutating routes are POST-only (the reference's routing table): a GET
    * from a crawler/prefetcher must never skip a parked DDL. Responds 405
    * and returns false when the method is wrong. */
  private def requirePost(ex: HttpExchange): Boolean =
    if (ex.getRequestMethod.equalsIgnoreCase("POST")) true
    else { respond(ex, 405, "method not allowed (POST required)", json = false); false }

  /** Query-string + urlencoded-body params (the reference's req.FormValue).
    * Parsed once — the request body is consumable only once. */
  private def formValues(ex: HttpExchange): Map[String, String] = {
    val sources = Option(ex.getRequestURI.getRawQuery).toSeq :+
      new String(ex.getRequestBody.readAllBytes(), UTF_8)
    sources.flatMap(_.split('&')).collect {
      case kv if kv.contains('=') =>
        kv.takeWhile(_ != '=') -> URLDecoder.decode(kv.dropWhile(_ != '=').tail, UTF_8)
    }.filter(_._2.nonEmpty).toMap
  }

  server.createContext("/", (ex: HttpExchange) => {
    try route(ex)
    catch { case e: Exception => err(ex, String.valueOf(e.getMessage)) }
  })

  private def route(ex: HttpExchange): Unit = {
    val segs = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).toList
    segs match {
      case "status" :: Nil =>
        ok(ex, jobj(
          (Seq(
            "version" -> jstr(AdminServer.Version),
            "git_hash" -> jstr(""),
            "build_ts" -> jstr(""),
            "mode" -> jstr(mode())) ++
            progress().map(p => "progress" -> jstr(p))): _*))

      case "metrics" :: Nil =>
        respond(ex, 200, counters.prometheusText, json = false)

      case "schema" :: Nil =>
        ok(ex, jarr(tracker.getDatabases.map(jstr)))
      case "schema" :: db :: Nil =>
        ok(ex, jarr(tracker.getTables(db).map(jstr)))
      case "schema" :: db :: table :: Nil =>
        tracker.getTableDef(db, table) match {
          case Some(t) => ok(ex, tableJson(t))
          case None => err(ex, s"no such table: $db.$table")
        }

      case "ddl" :: "failed" :: Nil =>
        gate.failed match {
          case Some(f) => ok(ex, jobj(
            "db" -> jstr(f.db),
            "statement" -> jstr(f.statement),
            "reason" -> jstr(f.error),
            "tips" -> jstr("POST /ddl/exec with statement=<corrected sql> to repair the mirror, then POST /ddl/retry (or /ddl/skip if the mirror is already correct)")))
          case None => respond(ex, 200, "", json = false)
        }

      case "ddl" :: "retry" :: Nil =>
        if (!requirePost(ex)) ()
        else if (!gate.isParked) err(ex, "no failed ddl")
        else if (gate.retry()) respond(ex, 200, "", json = false)
        else err(ex, "retry failed: " + gate.failed.map(_.error).getOrElse(""))

      case "ddl" :: "exec" :: Nil =>
        if (!requirePost(ex)) return
        val form = formValues(ex)
        form.get("statement") match {
          case None => err(ex, "param \"statement\" is empty")
          case Some(stmt) =>
            gate.exec(stmt, form.getOrElse("db", "")) match {
              case Right(()) => respond(ex, 200, "", json = false)
              case Left(e) => err(ex, e)
            }
        }

      case "ddl" :: "skip" :: Nil =>
        if (!requirePost(ex)) ()
        else if (!gate.isParked) err(ex, "no failed ddl")
        else { gate.skip(); respond(ex, 200, "", json = false) }

      // ---- /debug/* — the JVM twins of the reference's pprof endpoints
      // (cmd/dolphinbeat/http.go:33-39): live thread + heap inspection
      // without shelling into the box ----
      case "debug" :: "threads" :: Nil =>
        val mx = java.lang.management.ManagementFactory.getThreadMXBean
        val sb = new StringBuilder
        mx.dumpAllThreads(false, false).foreach { t =>
          sb.append(s""""${t.getThreadName}" #${t.getThreadId} ${t.getThreadState}""")
          sb.append('\n')
          t.getStackTrace.foreach(f => sb.append("\tat ").append(f).append('\n'))
          sb.append('\n')
        }
        respond(ex, 200, sb.toString, json = false)

      case "debug" :: "heap" :: Nil =>
        // prefer the HotSpot class histogram (jmap -histo parity) via the
        // DiagnosticCommand MBean; fall back to pool usage on JVMs
        // without it
        val body =
          try {
            val server = java.lang.management.ManagementFactory.getPlatformMBeanServer
            server.invoke(
              new javax.management.ObjectName("com.sun.management:type=DiagnosticCommand"),
              "gcClassHistogram",
              Array[AnyRef](null), Array("[Ljava.lang.String;")).toString
          } catch {
            case _: Exception =>
              val mem = java.lang.management.ManagementFactory.getMemoryMXBean
              val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
              val sb = new StringBuilder
              val h = mem.getHeapMemoryUsage
              sb.append(s"heap: used=${h.getUsed} committed=${h.getCommitted} max=${h.getMax}\n")
              pools.forEach { p =>
                val u = p.getUsage
                if (u != null)
                  sb.append(s"pool ${p.getName}: used=${u.getUsed} committed=${u.getCommitted}\n")
              }
              sb.toString
          }
        respond(ex, 200, body, json = false)

      case _ => respond(ex, 404, "not found", json = false)
    }
  }
}

object AdminServer {
  val Version = "0.1.0"
}
