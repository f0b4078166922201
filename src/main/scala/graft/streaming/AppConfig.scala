package graft.streaming

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Single-file deployment config — the reference's TOML app config
  * (/root/reference/cmd/dolphinbeat/config.go:73-106 +
  * dolphinbeat.toml.sample) re-expressed as a dependency-free TOML-subset
  * parser: `key = value` (string/int/bool/string-array), `[section]`
  * (dotted key prefix), and `[[sink]]` tables with a nested `[sink.cfg]`.
  * Everything the pipeline main needs comes from ONE file: source, per-sink
  * filters, checkpoint storage, admin port, election — no env vars.
  */
object AppConfig {

  final case class Sink(
      name: String,
      tpe: String,
      enabled: Boolean,
      includeTable: Seq[String],
      excludeTable: Seq[String],
      cfg: Map[String, String])

  final case class Config(raw: Map[String, String], sinks: Seq[Sink]) {
    def str(key: String): Option[String] = raw.get(key)
    def str(key: String, dflt: String): String = raw.getOrElse(key, dflt)
    def int(key: String, dflt: Long): Long = raw.get(key).map(_.toLong).getOrElse(dflt)
    def bool(key: String, dflt: Boolean): Boolean =
      raw.get(key).map(_.toBoolean).getOrElse(dflt)

    // ---- typed views of the reference's config surface ----
    def mysqlAddr: Option[String] = str("mysql_addr")
    def mysqlUser: String = str("mysql_user", "")
    def mysqlPassword: String = str("mysql_password", "")
    def serverId: Long = int("server_id", 1001L)
    def gtidEnabled: Boolean = bool("gtid_enabled", dflt = false)
    /** Transport-blip retries for the live source (0 disables). */
    def maxReconnects: Int = int("max_reconnects", 3L).toInt
    def reconnectBackoffMs: Long = int("reconnect_backoff_ms", 500L)

    /** `:8080` or `host:8080` → 8080. */
    def adminPort: Option[Int] =
      str("http_server.addr").map(_.split(':').last.toInt)

    def electionEnabled: Boolean = bool("election.enabled", dflt = false)
    def electionZkHosts: String = str("election.zk_hosts", "")
    def electionZkPath: String = str("election.zk_path", "/graft/election")

    /** Checkpoint storage as a [[graft.cdc.CkpStorage.forUri]] uri:
      * `storage = "zookeeper"` maps to `zk://hosts/path`, else the dir. */
    def ckpUri: Option[String] = str("checkpoint.storage") match {
      case Some("zookeeper") =>
        Some(s"zk://${str("checkpoint.zk_hosts", "")}${str("checkpoint.zk_path", "/graft/ckp")}")
      case Some("file") | None => str("checkpoint.dir")
      case Some(other) => throw new IllegalArgumentException(s"unknown checkpoint.storage: $other")
    }

    def enabledSinks: Seq[Sink] = sinks.filter(_.enabled)
    def sinkOfType(tpe: String): Option[Sink] = enabledSinks.find(_.tpe == tpe)

    /** Replay-main wiring (this port's fixture-driven twin of mysql_addr). */
    def replayFixture: Option[String] = str("replay.fixture")
    def replayOutDir: Option[String] = str("replay.out_dir")
    def schemaSeedSql: Option[String] = str("schema_tracker.seed_sql")
    /** Position-keyed schema-snapshot directory (the boltdb-twin store). */
    def schemaTrackerDir: Option[String] = str("schema_tracker.dir")
  }

  def parseFile(p: Path): Config = parse(Files.readAllLines(p).asScala.mkString("\n"))

  def parse(text: String): Config = {
    val top = Map.newBuilder[String, String]
    var sinks = Vector.empty[SinkBuilder]
    var prefix = "" // "section." while inside [section]
    var inSink = false // inside the latest [[sink]] (or its [sink.cfg])
    var sinkCfg = false // inside [sink.cfg]

    final class SinkBuilder {
      var fields = Map.empty[String, String]
      var arrays = Map.empty[String, Seq[String]]
      var cfg = Map.empty[String, String]
      def result: Sink = Sink(
        name = fields.getOrElse("name", ""),
        tpe = fields.getOrElse("type", ""),
        enabled = fields.get("enabled").forall(_.toBoolean),
        includeTable = arrays.getOrElse("include_table", Nil),
        excludeTable = arrays.getOrElse("exclude_table", Nil),
        cfg = cfg)
    }

    def stripValue(v: String): String = {
      val t = v.trim
      if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) {
        // TOML basic-string escapes (the subset the sample uses)
        val body = t.substring(1, t.length - 1)
        val sb = new StringBuilder
        var i = 0
        while (i < body.length) {
          if (body.charAt(i) == '\\' && i + 1 < body.length) {
            body.charAt(i + 1) match {
              case '\\' => sb.append('\\')
              case '"' => sb.append('"')
              case 'n' => sb.append('\n')
              case 't' => sb.append('\t')
              case other => sb.append('\\').append(other)
            }
            i += 2
          } else { sb.append(body.charAt(i)); i += 1 }
        }
        sb.toString
      } else t
    }

    text.linesIterator.foreach { rawLine =>
      // a # inside quotes would be a false comment cut — the subset forbids
      // it, like the reference's sample (no # appears in any value there)
      val line = rawLine.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        if (line == "[[sink]]") {
          sinks :+= new SinkBuilder; inSink = true; sinkCfg = false
        } else if (line == "[sink.cfg]") {
          require(inSink, "[sink.cfg] outside a [[sink]] table")
          sinkCfg = true
        } else if (line.startsWith("[") && line.endsWith("]")) {
          prefix = line.substring(1, line.length - 1) + "."
          inSink = false; sinkCfg = false
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"malformed config line: $rawLine")
          val key = line.substring(0, eq).trim
          val value = line.substring(eq + 1).trim
          // one array-literal parser for both branches — they must never
          // drift (a fix applied to one would leave [sink.cfg] arrays
          // behaving differently from sink-level arrays)
          def parseArray(v: String): Seq[String] = {
            val inner = v.stripPrefix("[").stripSuffix("]").trim
            if (inner.isEmpty) Nil else inner.split(",").map(stripValue).toSeq
          }
          if (inSink) {
            val sb = sinks.last
            if (sinkCfg) {
              // cfg is a flat string map (the reference unmarshals it per
              // sink type): an array value is preserved as its rendered
              // comma-joined form rather than silently dropped (consumers
              // that take one address read the first entry)
              if (value.startsWith("["))
                sb.cfg += key -> parseArray(value).mkString(",")
              else sb.cfg += key -> stripValue(value)
            } else if (value.startsWith("[")) {
              sb.arrays += key -> parseArray(value)
            } else sb.fields += key -> stripValue(value)
          } else {
            top += (prefix + key) -> stripValue(value)
          }
        }
      }
    }
    Config(top.result(), sinks.map(_.result))
  }
}
