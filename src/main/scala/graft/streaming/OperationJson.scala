package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.cdc._
import scala.jdk.CollectionConverters._

/** JSON twin of the reference's stdout sink operation shape
  * (/root/reference/sink/stdout/operation.go:28-97): one object per
  * operation, optional fields omitted, rows as before/after value arrays.
  *
  * The in-memory envelope transports values stringly (with explicit nulls,
  * like the Kafka wire format); the JSON writer re-binds numeric types from
  * the attached TableDef so output is golden-comparable with the reference
  * (ints render unquoted, strings quoted).
  */
object OperationJson {
  private val mapper = new ObjectMapper()

  // ---------- render ----------

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val numericTypes: Set[Int] = Set(
    InnerType.TINY, InnerType.SHORT, InnerType.INT24, InnerType.LONG,
    InnerType.LONGLONG, InnerType.YEAR, InnerType.FLOAT, InnerType.DOUBLE,
    InnerType.DECIMAL, InnerType.NEWDECIMAL)

  private val numRe = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$".r

  private def renderValue(v: Option[String], col: Option[ColumnDef]): String = v match {
    case None => "null"
    case Some(s) =>
      val numeric = col.exists(c => numericTypes.contains(c.innerType)) &&
        numRe.findFirstIn(s).isDefined
      if (numeric) s else "\"" + esc(s) + "\""
  }

  private def renderRowSide(vs: Vector[Option[String]], cols: Vector[ColumnDef]): String =
    vs.zipWithIndex.map { case (v, i) =>
      renderValue(v, cols.lift(i))
    }.mkString("[", ",", "]")

  def render(op: Operation): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"header\":{")
      .append("\"server_id\":").append(op.header.serverId)
      .append(",\"type\":\"").append(op.header.opType).append('"')
      .append(",\"timestamp\":").append(op.header.timestamp)
      .append(",\"log_pos\":").append(op.header.logPos)
      .append('}')
    op.nextLogName.foreach(n => sb.append(",\"next_log_name\":\"").append(esc(n)).append('"'))
    op.nextLogPos.foreach(p => sb.append(",\"next_log_pos\":").append(p))
    op.gtid.foreach(g => sb.append(",\"gtid\":\"").append(esc(g)).append('"'))
    op.database.foreach(d => sb.append(",\"database\":\"").append(esc(d)).append('"'))
    op.statement.foreach(s => sb.append(",\"statement\":\"").append(esc(s)).append('"'))
    op.table.foreach { t =>
      sb.append(",\"table\":{\"database\":\"").append(esc(t.database))
        .append("\",\"name\":\"").append(esc(t.name)).append("\",\"columns\":[")
      sb.append(t.columns.map { c =>
        s"""{"name":"${esc(c.name)}","sql_type":"${esc(c.sqlType)}","inner_type":${c.innerType},""" +
          s""""unsigned":${c.unsigned},"key":"${esc(c.key)}","charset":"${esc(c.charset)}"}"""
      }.mkString(","))
      sb.append("]}")
    }
    if (op.rows.nonEmpty) {
      val cols = op.table.map(_.columns).getOrElse(Vector.empty)
      sb.append(",\"rows\":[")
      sb.append(op.rows.map { r =>
        val parts = Seq(
          r.before.map(b => "\"before\":" + renderRowSide(b, cols)),
          r.after.map(a => "\"after\":" + renderRowSide(a, cols))).flatten
        parts.mkString("{", ",", "}")
      }.mkString(","))
      sb.append(']')
    }
    op.progress.foreach { p =>
      sb.append(",\"progress\":{\"flavor\":\"mysql\",\"server_id\":").append(p.pos.serverId)
        .append(",\"log_name\":\"").append(esc(p.pos.name))
        .append("\",\"log_pos\":").append(p.pos.pos)
        .append(",\"gset\":\"").append(esc(p.gset.map(_.toString).getOrElse("")))
        .append("\"}")
    }
    sb.append('}')
    sb.toString
  }

  // ---------- parse (fixture JSON lines, FIXTURES.md §2) ----------

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def valueOf(n: JsonNode): Option[String] =
    if (n == null || n.isNull) None else Some(n.asText)

  private def rowSide(n: JsonNode): Option[Vector[Option[String]]] =
    Option(n).filterNot(_.isNull).map(_.elements().asScala.toVector.map(e =>
      if (e.isNull) None else Some(e.asText)))

  def parse(line: String): Operation = {
    val n = mapper.readTree(line)
    val h = n.get("header")
    val header = OperationHeader(
      serverId = h.get("server_id").asLong,
      opType = h.get("type").asText,
      timestamp = h.get("timestamp").asLong,
      logPos = h.get("log_pos").asLong)
    val table = Option(n.get("table")).filterNot(_.isNull).map { t =>
      TableDef(
        t.get("database").asText,
        t.get("name").asText,
        t.get("columns").elements().asScala.toVector.map { c =>
          ColumnDef(
            name = c.get("name").asText,
            sqlType = optText(c, "sql_type").getOrElse(""),
            innerType = Option(c.get("inner_type")).map(_.asInt).getOrElse(InnerType.VARCHAR),
            key = optText(c, "key").getOrElse(""),
            charset = optText(c, "charset").getOrElse(""),
            unsigned = Option(c.get("unsigned")).exists(_.asBoolean),
            nullable = Option(c.get("nullable")).forall(_.asBoolean))
        })
    }
    val rows = Option(n.get("rows")).filterNot(_.isNull)
      .map(_.elements().asScala.toVector.map { r =>
        OpRow(rowSide(r.get("before")), rowSide(r.get("after")))
      }).getOrElse(Vector.empty)
    val progress = Option(n.get("progress")).filterNot(_.isNull).map { p =>
      Progress(
        Position(p.get("log_name").asText, p.get("log_pos").asLong,
          p.get("server_id").asLong),
        optText(p, "gset").filter(_.nonEmpty).map(Gset.parse))
    }
    Operation(header,
      nextLogName = optText(n, "next_log_name"),
      nextLogPos = Option(n.get("next_log_pos")).filterNot(_.isNull).map(_.asLong),
      gtid = optText(n, "gtid"),
      database = optText(n, "database"),
      statement = optText(n, "statement"),
      table = table,
      rows = rows,
      progress = progress)
  }
}
