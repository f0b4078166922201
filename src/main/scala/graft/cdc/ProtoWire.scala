package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Wire-compatible protobuf (proto3) codec for the reference's Kafka sink
  * contract — the field numbers, types and enum values of
  * /root/reference/sink/kafka/protocol/protocol.proto:4-151, hand-rolled on
  * the public proto3 wire format (varint tags, length-delimited submessages)
  * so third-party consumers built against that .proto (e.g. the reference's
  * client decoder, /root/reference/sink/kafka/client/go/decoder.go) can
  * decode messages produced here, with zero added dependencies.
  *
  * proto3 semantics honored: default-valued scalar fields are omitted on
  * encode and implied on decode; submessages are encoded when present even
  * if empty (presence = the Option); repeated fields are concatenated
  * occurrences. Layout notes where the graft model is richer/poorer than
  * the proto:
  *  - `ColumnDef.nullable` and table-level charset have no proto field —
  *    they decode to the model defaults (nullable=true, "utf8mb4");
  *  - `Operation.last_committed/sequence_number` (GTID group commit info)
  *    have no model field — encoded as 0/omitted, skipped on decode;
  *  - `Progress.flavor` is constant "mysql";
  *  - `Message.compression`: ZLIB(1) when compressed (GZIP is refused).
  */
object ProtoWire extends WireCodec {

  // ---- OperationType enum (protocol.proto:4-14) <-> OpType strings ----
  private val opTypeToEnum: Map[String, Int] = Map(
    OpType.Rotate -> 0, OpType.Gtid -> 1, OpType.Begin -> 2, OpType.Commit -> 3,
    OpType.Insert -> 4, OpType.Update -> 5, OpType.Delete -> 6, OpType.Query -> 7,
    OpType.Ddl -> 8)
  private val enumToOpType: Map[Int, String] = opTypeToEnum.map(_.swap)

  // ---------- proto3 primitives ----------

  private final class W {
    val buf = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0L) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    /** varint scalar — omitted at 0, per proto3 */
    def uint(field: Int, v: Long): Unit = if (v != 0L) { tag(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit = if (v) { tag(field, 0); varint(1L) }
    /** length-delimited — string omitted when empty, per proto3 */
    def str(field: Int, s: String): Unit =
      if (s.nonEmpty) bytes(field, s.getBytes(UTF_8))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
    }
    /** submessage — encoded even when empty (presence carries meaning) */
    def msg(field: Int, body: W): Unit = bytes(field, body.result)
    def result: Array[Byte] = buf.toByteArray
  }

  private final class R(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    def hasNext: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        val x = b(pos); pos += 1
        out |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint overrun")
      }
      out
    }
    /** returns (fieldNumber, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def sub(): R = {
      val len = varint().toInt
      val r = new R(b, pos, pos + len)
      pos += len
      r
    }
    def byteSlice(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      out
    }
    def strVal(): String = new String(byteSlice(), UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---------- message encoders (field numbers from protocol.proto) ----------

  private def encColumn(v: Option[String]): W = {
    val w = new W
    v match {
      case None => w.bool(1, v = true) // is_null = 1
      case Some(s) => w.str(2, s)      // value = 2
    }
    w
  }

  private def encRow(r: OpRow): W = {
    val w = new W
    r.before.foreach(_.foreach(c => w.msg(1, encColumn(c))))
    r.after.foreach(_.foreach(c => w.msg(2, encColumn(c))))
    w
  }

  private def encColumnDef(c: ColumnDef): W = {
    val w = new W
    w.str(1, c.name); w.str(2, c.sqlType); w.uint(3, c.innerType.toLong)
    w.bool(4, c.unsigned); w.str(5, c.key); w.str(6, c.charset)
    w
  }

  private def encTableDef(t: TableDef): W = {
    val w = new W
    w.str(1, t.database); w.str(2, t.name)
    t.columns.foreach(c => w.msg(3, encColumnDef(c)))
    w
  }

  private def encProgress(p: Progress): W = {
    val w = new W
    w.str(1, "mysql")                 // flavor
    w.uint(2, p.pos.serverId)         // server_id
    w.str(3, p.pos.name)              // log_name
    w.uint(4, p.pos.pos)              // log_pos
    p.gset.foreach(g => w.str(5, g.toString)) // gset
    w
  }

  private def encHeader(h: OperationHeader): W = {
    val w = new W
    w.uint(1, h.serverId)
    w.uint(2, opTypeToEnum(h.opType).toLong)
    w.uint(3, h.timestamp)
    w.uint(4, h.logPos)
    w
  }

  private def encOperation(op: Operation): W = {
    val w = new W
    w.msg(1, encHeader(op.header))
    op.nextLogName.foreach(w.str(6, _))
    op.nextLogPos.foreach(w.uint(7, _))
    op.gtid.foreach(w.str(8, _))
    // last_committed(9) / sequence_number(10): not modeled, omitted (= 0)
    op.database.foreach(w.str(11, _))
    op.statement.foreach(w.str(12, _))
    op.table.foreach(t => w.msg(13, encTableDef(t)))
    op.rows.foreach(r => w.msg(14, encRow(r)))
    op.progress.foreach(p => w.msg(15, encProgress(p)))
    w
  }

  /** Payload { repeated Operation ops = 1 } */
  def encodeOps(ops: Seq[Operation]): Array[Byte] = {
    val w = new W
    ops.foreach(op => w.msg(1, encOperation(op)))
    w.result
  }

  /** One tagged repeated-field entry; proto repeated fields concatenate, so
    * assembleOps is plain concatenation (byte-identical to encodeOps). */
  def encodeOp(op: Operation): Array[Byte] = {
    val w = new W
    w.msg(1, encOperation(op))
    w.result
  }

  def assembleOps(fragments: Seq[Array[Byte]]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(fragments.iterator.map(_.length).sum)
    fragments.foreach(buf.put)
    buf.array()
  }

  // ---------- message decoders ----------

  private def decColumn(r: R): Option[String] = {
    var isNull = false
    var value = ""
    while (r.hasNext) r.tag() match {
      case (1, 0) => isNull = r.varint() != 0
      case (2, 2) => value = r.strVal()
      case (_, w) => r.skip(w)
    }
    if (isNull) None else Some(value)
  }

  private def decRow(r: R): OpRow = {
    val before = Vector.newBuilder[Option[String]]
    val after = Vector.newBuilder[Option[String]]
    var nb = 0; var na = 0
    while (r.hasNext) r.tag() match {
      case (1, 2) => before += decColumn(r.sub()); nb += 1
      case (2, 2) => after += decColumn(r.sub()); na += 1
      case (_, w) => r.skip(w)
    }
    OpRow(
      before = if (nb == 0) None else Some(before.result()),
      after = if (na == 0) None else Some(after.result()))
  }

  private def decColumnDef(r: R): ColumnDef = {
    var name = ""; var sqlType = ""; var inner = 0
    var unsigned = false; var key = ""; var charset = ""
    while (r.hasNext) r.tag() match {
      case (1, 2) => name = r.strVal()
      case (2, 2) => sqlType = r.strVal()
      case (3, 0) => inner = r.varint().toInt
      case (4, 0) => unsigned = r.varint() != 0
      case (5, 2) => key = r.strVal()
      case (6, 2) => charset = r.strVal()
      case (_, w) => r.skip(w)
    }
    ColumnDef(name, sqlType, inner, key, charset, unsigned)
  }

  private def decTableDef(r: R): TableDef = {
    var db = ""; var name = ""
    val cols = Vector.newBuilder[ColumnDef]
    while (r.hasNext) r.tag() match {
      case (1, 2) => db = r.strVal()
      case (2, 2) => name = r.strVal()
      case (3, 2) => cols += decColumnDef(r.sub())
      case (_, w) => r.skip(w)
    }
    TableDef(db, name, cols.result())
  }

  private def decProgress(r: R): Progress = {
    var serverId = 0L; var logName = ""; var logPos = 0L
    var gset: Option[String] = None
    while (r.hasNext) r.tag() match {
      case (1, 2) => r.strVal(); () // flavor — constant, not modeled
      case (2, 0) => serverId = r.varint()
      case (3, 2) => logName = r.strVal()
      case (4, 0) => logPos = r.varint()
      case (5, 2) => gset = Some(r.strVal())
      case (_, w) => r.skip(w)
    }
    Progress(Position(logName, logPos, serverId), gset.map(Gset.parse))
  }

  private def decHeader(r: R): OperationHeader = {
    var serverId = 0L; var tpe = 0; var ts = 0L; var logPos = 0L
    while (r.hasNext) r.tag() match {
      case (1, 0) => serverId = r.varint()
      case (2, 0) => tpe = r.varint().toInt
      case (3, 0) => ts = r.varint()
      case (4, 0) => logPos = r.varint()
      case (_, w) => r.skip(w)
    }
    OperationHeader(serverId, enumToOpType(tpe), ts, logPos)
  }

  private def decOperation(r: R): Operation = {
    var header = OperationHeader(0, OpType.Rotate, 0, 0)
    var nextLogName: Option[String] = None
    var nextLogPos: Option[Long] = None
    var gtid: Option[String] = None
    var database: Option[String] = None
    var statement: Option[String] = None
    var table: Option[TableDef] = None
    val rows = Vector.newBuilder[OpRow]
    var progress: Option[Progress] = None
    while (r.hasNext) r.tag() match {
      case (1, 2) => header = decHeader(r.sub())
      case (6, 2) => nextLogName = Some(r.strVal())
      case (7, 0) => nextLogPos = Some(r.varint())
      case (8, 2) => gtid = Some(r.strVal())
      case (9, 0) | (10, 0) => r.varint(); () // last_committed / sequence_number
      case (11, 2) => database = Some(r.strVal())
      case (12, 2) => statement = Some(r.strVal())
      case (13, 2) => table = Some(decTableDef(r.sub()))
      case (14, 2) => rows += decRow(r.sub())
      case (15, 2) => progress = Some(decProgress(r.sub()))
      case (_, w) => r.skip(w)
    }
    Operation(header, nextLogName, nextLogPos, gtid, database, statement,
      table, rows.result(), progress)
  }

  def decodeOps(bytes: Array[Byte]): Vector[Operation] = {
    val r = new R(bytes, 0, bytes.length)
    val ops = Vector.newBuilder[Operation]
    while (r.hasNext) r.tag() match {
      case (1, 2) => ops += decOperation(r.sub())
      case (_, w) => r.skip(w)
    }
    ops.result()
  }

  // ---------- Message envelope (protocol.proto:56-76) ----------

  def encodeMessage(m: Wire.Message): Array[Byte] = {
    val w = new W
    w.uint(1, 1L)                  // version
    w.uint(2, m.producerId)        // producer_id
    w.uint(5, m.seq)               // seq
    w.bool(6, m.moreFragment)      // more_fragment
    w.uint(7, m.groupId)           // group_id
    w.uint(8, if (m.compressed) 1L else 0L) // compression = ZLIB|NONE
    w.bytes(15, m.payload)         // payload
    w
  }.result

  def decodeMessage(bytes: Array[Byte]): Wire.Message = {
    val r = new R(bytes, 0, bytes.length)
    var producerId = 0L; var seq = 0L; var groupId = 0L
    var more = false; var compression = 0L
    var payload = Array.emptyByteArray
    while (r.hasNext) r.tag() match {
      case (1, 0) => r.varint(); () // version
      case (2, 0) => producerId = r.varint()
      case (5, 0) => seq = r.varint()
      case (6, 0) => more = r.varint() != 0
      case (7, 0) => groupId = r.varint()
      case (8, 0) => compression = r.varint()
      case (15, 2) => payload = r.byteSlice()
      case (_, w) => r.skip(w)
    }
    require(compression != 2L, "GZIP compression is not supported (ZLIB only)")
    Wire.Message(producerId, seq, groupId, compression == 1L, more, payload)
  }
}
