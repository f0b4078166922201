package graft.cdc

import org.apache.spark.sql.types._

/** MySQL binlog inner type bytes (the wire protocol's column type ids),
  * mirroring /root/reference/schema/definition.go:22-53. */
object InnerType {
  val DECIMAL: Int = 0
  val TINY: Int = 1
  val SHORT: Int = 2
  val LONG: Int = 3
  val FLOAT: Int = 4
  val DOUBLE: Int = 5
  val NULL: Int = 6
  val TIMESTAMP: Int = 7
  val LONGLONG: Int = 8
  val INT24: Int = 9
  val DATE: Int = 10
  val TIME: Int = 11
  val DATETIME: Int = 12
  val YEAR: Int = 13
  val NEWDATE: Int = 14
  val VARCHAR: Int = 15
  val BIT: Int = 16
  val JSON: Int = 0xf5
  val NEWDECIMAL: Int = 0xf6
  val ENUM: Int = 0xf7
  val SET: Int = 0xf8
  val TINY_BLOB: Int = 0xf9
  val MEDIUM_BLOB: Int = 0xfa
  val LONG_BLOB: Int = 0xfb
  val BLOB: Int = 0xfc
  val VAR_STRING: Int = 0xfd
  val STRING: Int = 0xfe
  val GEOMETRY: Int = 0xff
}

/** Column definition in the tracked schema
  * (/root/reference/schema/definition.go:64-71). */
final case class ColumnDef(
    name: String,
    sqlType: String,
    innerType: Int,
    key: String = "",
    charset: String = "",
    unsigned: Boolean = false,
    nullable: Boolean = true)

/** Table definition attached to every row event
  * (/root/reference/schema/definition.go:73-79). */
final case class TableDef(
    database: String,
    name: String,
    columns: Vector[ColumnDef],
    charset: String = "utf8mb4") {
  def key: String = s"$database.$name"
  def columnIndex(col: String): Int = columns.indexWhere(_.name == col)
}

/** MySQL inner type → Catalyst type (SURVEY.md §1.4 mapping table). Unsigned
  * integers widen one level; unsigned LONGLONG becomes DECIMAL(20,0). */
object TypeMapper {
  import InnerType._

  def toCatalyst(c: ColumnDef): DataType = c.innerType match {
    case TINY => if (c.unsigned) ShortType else ByteType
    case SHORT => if (c.unsigned) IntegerType else ShortType
    case INT24 => IntegerType
    case LONG => if (c.unsigned) LongType else IntegerType
    case LONGLONG => if (c.unsigned) DecimalType(20, 0) else LongType
    case YEAR => ShortType
    case FLOAT => FloatType
    case DOUBLE => DoubleType
    case DECIMAL | NEWDECIMAL => parseDecimal(c.sqlType)
    case DATE | NEWDATE => DateType
    case DATETIME | TIMESTAMP => TimestampType
    case TIME => StringType // MySQL TIME can exceed 24h; no interval parity
    case BIT | TINY_BLOB | MEDIUM_BLOB | LONG_BLOB | BLOB | GEOMETRY => BinaryType
    case VARCHAR | VAR_STRING | STRING | ENUM | SET | JSON => StringType
    case NULL => NullType
    case _ => StringType
  }

  private val DecRe = """(?i)decimal\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r.unanchored

  def parseDecimal(sqlType: String): DecimalType = sqlType match {
    case DecRe(p, s) => DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0))
    case _ => DecimalType(10, 0)
  }

  /** TableDef → StructType; CDC metadata rides in field metadata. */
  def toStruct(t: TableDef): StructType =
    StructType(t.columns.map { c =>
      val md = new MetadataBuilder()
        .putBoolean("unsigned", c.unsigned)
        .putString("key", c.key)
        .putString("charset", c.charset)
        .putString("mysql_type", c.sqlType)
        .putLong("inner_type", c.innerType.toLong)
        .build()
      StructField(c.name, toCatalyst(c), nullable = c.nullable, metadata = md)
    })
}

/** The nine operation types
  * (/root/reference/sink/stdout/operation.go:28-38). */
object OpType {
  val Rotate = "rotate"
  val Gtid = "gtid"
  val Begin = "begin"
  val Commit = "commit"
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Query = "query"
  val Ddl = "ddl"
}

final case class OperationHeader(
    serverId: Long,
    opType: String,
    timestamp: Long,
    logPos: Long)

/** before/after row pair; insert fills only `after`, delete only `before`,
  * update both (/root/reference/sink/stdout/operation.go:40-43). Values are
  * transported stringly with an explicit null flag, like the Kafka wire
  * format (/root/reference/sink/kafka/operation.go:158-178) — types bind at
  * the analytics edge via TableDef.
  */
final case class OpRow(
    before: Option[Vector[Option[String]]],
    after: Option[Vector[Option[String]]])

/** One binlog event as a typed envelope — the unit of the change stream
  * (/root/reference/sink/stdout/operation.go:75-97). Exactly one payload
  * group is populated per type. */
final case class Operation(
    header: OperationHeader,
    // rotate
    nextLogName: Option[String] = None,
    nextLogPos: Option[Long] = None,
    // gtid
    gtid: Option[String] = None,
    // query/ddl
    database: Option[String] = None,
    statement: Option[String] = None,
    // insert/update/delete
    table: Option[TableDef] = None,
    rows: Vector[OpRow] = Vector.empty,
    // commit/ddl
    progress: Option[Progress] = None) {

  def opType: String = header.opType

  def positionOrZero: Position =
    progress.map(_.pos).getOrElse(Position("", header.logPos, header.serverId))
}

object Operation {
  /** UPDATE row events pair [before, after] — the reference's pairing walk
    * (/root/reference/sink/stdout/operation.go:128-142). */
  def pairUpdateRows(raw: Seq[Vector[Option[String]]]): Vector[OpRow] = {
    require(raw.size % 2 == 0, s"update event with odd row-image count: ${raw.size}")
    raw.grouped(2).map { pair =>
      OpRow(before = Some(pair(0)), after = Some(pair(1)))
    }.toVector
  }
}
