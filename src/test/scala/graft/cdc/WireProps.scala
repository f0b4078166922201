package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** SURVEY §5 property tests: wire-protocol round-trip (split∘merge = id),
  * consumer seq-dedup idempotence, and fragmentation envelope laws, over
  * generated operation streams. */
object WireProps extends Properties("Wire") {

  private val genValue: Gen[Option[String]] =
    Gen.option(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const(""),
      Gen.const("with\nnewline\tand\u0000nul"),
      Gen.asciiPrintableStr))

  private val genRowVals: Gen[Vector[Option[String]]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, genValue).map(_.toVector))

  private val tdef = TableDef("db", "t", Vector(
    ColumnDef("a", "int(11)", InnerType.LONG),
    ColumnDef("b", "varchar(10)", InnerType.VARCHAR),
    ColumnDef("c", "blob", InnerType.BLOB),
    ColumnDef("d", "int(11)", InnerType.LONG)))

  private def header(tpe: String, pos: Long) = OperationHeader(1L, tpe, 1589442258L, pos)

  private val genOp: Gen[Operation] = Gen.chooseNum(100L, 1L << 40).flatMap { pos =>
    Gen.oneOf[Gen[Operation]](
      Gen.const(Operation(header(OpType.Begin, pos))),
      genRowVals.map(v => Operation(header(OpType.Insert, pos),
        table = Some(tdef), rows = Vector(OpRow(None, Some(v))))),
      genRowVals.flatMap(b => genRowVals.map(a => Operation(header(OpType.Update, pos),
        table = Some(tdef), rows = Vector(OpRow(Some(b), Some(a)))))),
      genRowVals.map(v => Operation(header(OpType.Delete, pos),
        table = Some(tdef), rows = Vector(OpRow(Some(v), None)))),
      Gen.const(Operation(header(OpType.Commit, pos),
        progress = Some(Progress("mysql-bin.000001", pos, 1L)))),
      Gen.alphaNumStr.map(s => Operation(header(OpType.Ddl, pos),
        database = Some("db"), statement = Some(s"CREATE TABLE x$s (id INT)"),
        progress = Some(Progress("mysql-bin.000001", pos, 1L)))),
      Gen.const(Operation(header(OpType.Rotate, pos),
        nextLogName = Some("mysql-bin.000002"), nextLogPos = Some(4L))),
      Gen.alphaNumStr.map(g => Operation(header(OpType.Gtid, pos),
        gtid = Some(s"de278ad0-2106-11e4-9f8e-6edd0ca20947:1-$pos"))),
    ).flatMap(identity)
  }

  private val genOps: Gen[Vector[Operation]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, genOp).map(_.toVector))

  // both codecs must satisfy the same laws — the envelope semantics sit
  // above the WireCodec seam
  private val codecs = Seq("framed" -> (Wire: WireCodec), "proto" -> (ProtoWire: WireCodec))

  for ((cname, codec) <- codecs) {
    property(s"encodeOps/decodeOps round-trip [$cname]") = forAll(genOps) { ops =>
      codec.decodeOps(codec.encodeOps(ops)) == ops
    }

    property(s"produce → feed reassembles the exact op stream (split∘merge = id) [$cname]") =
      forAll(genOps, Gen.chooseNum(64, 4096)) { (ops, maxPayload) =>
        val producer = new FragmentingProducer(producerId = 7L,
          maxPayloadSize = maxPayload, codec = codec)
        val messages = producer.produce(ops)
        val dec = new OperationDecoder(codec)
        val out = messages.zipWithIndex.flatMap { case (m, i) =>
          dec.feed(codec.encodeMessage(m), i.toLong).toVector.flatMap(_.ops)
        }
        Prop(out == ops) :| s"got ${out.size} ops, expected ${ops.size} (maxPayload=$maxPayload)"
      }

    property(s"assembleOps ∘ encodeOp == encodeOps (parallel-encode contract) [$cname]") =
      forAll(genOps) { ops =>
        codec.assembleOps(ops.map(codec.encodeOp)).toSeq == codec.encodeOps(ops).toSeq
      }

    property(s"produceEncoded == produce, byte-for-byte [$cname]") =
      forAll(genOps, Gen.chooseNum(64, 4096), Gen.oneOf(false, true)) {
        (ops, maxPayload, compress) =>
          val p1 = new FragmentingProducer(7L, maxPayloadSize = maxPayload,
            compress = compress, codec = codec)
          val p2 = new FragmentingProducer(7L, maxPayloadSize = maxPayload,
            compress = compress, codec = codec)
          val m1 = p1.produce(ops).map(m => codec.encodeMessage(m).toSeq)
          val m2 = p2.produceEncoded(ops.map(codec.encodeOp)).map(m => codec.encodeMessage(m).toSeq)
          Prop(m1 == m2) :| s"${m1.size} vs ${m2.size} messages (maxPayload=$maxPayload, compress=$compress)"
      }
  }

  property("TypedTrxBatcher over (opType, bytes) emits the same trx boundaries") =
    forAll(genOps, Gen.chooseNum(1, 5)) { (ops, emptyLimit) =>
      val b1 = new TrxBatcher(emptyLimit)
      val b2 = new TypedTrxBatcher[(String, Array[Byte])](_._1, emptyLimit)
      val out1 = ops.flatMap(op => b1.offer(op).toVector.flatten)
      val out2 = ops.flatMap { op =>
        b2.offer((op.opType, Wire.encodeOp(op))).toVector.flatten
      }
      Prop(out1.map(Wire.encodeOp(_).toSeq) == out2.map(_._2.toSeq)) :|
        s"${out1.size} vs ${out2.size} batched ops (emptyLimit=$emptyLimit)"
    }

  property("seq dedup: re-feeding every message changes nothing") =
    forAll(genOps) { ops =>
      val producer = new FragmentingProducer(producerId = 7L, maxPayloadSize = 512)
      val messages = producer.produce(ops)
      val dec = new OperationDecoder
      val out = messages.zipWithIndex.flatMap { case (m, i) =>
        val bytes = Wire.encodeMessage(m)
        val first = dec.feed(bytes, i.toLong).toVector.flatMap(_.ops)
        val dup = dec.feed(bytes, i.toLong).toVector.flatMap(_.ops) // duplicate delivery
        first ++ dup
      }
      Prop(out == ops) :| "duplicated messages must be dropped by seq dedup"
    }

  property("fragmentation envelope: all but the last fragment set more_fragment") =
    forAll(genOps) { ops =>
      val producer = new FragmentingProducer(producerId = 7L, maxPayloadSize = 128)
      val messages = producer.produce(ops)
      val byGroup = messages.groupBy(_.groupId)
      Prop(byGroup.values.forall { g =>
        g.init.forall(_.moreFragment) && !g.last.moreFragment
      }) && Prop(messages.map(_.seq) == (1L to messages.size.toLong).toVector)
    }

  property("compress/decompress round-trip") =
    forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { s =>
      val b = s.getBytes("UTF-8")
      Wire.decompress(Wire.compress(b)).toSeq == b.toSeq
    }
}
