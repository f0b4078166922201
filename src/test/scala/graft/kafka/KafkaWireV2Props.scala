package graft.kafka

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the magic-2 RecordBatch codec: zigzag varints
  * round-trip over the full Long range, batches round-trip (offsets from
  * any base, timestamp deltas, null keys), CRC-32C tamper detection at
  * every byte past the crc field, and concatenated-batch decode. */
object KafkaWireV2Props extends Properties("KafkaWireV2") {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  /** A batch's messages: ascending offsets from a random base, timestamps
    * at-or-after the first (the delta is a varlong, so any order would
    * encode — ascending just mirrors real producers). */
  private val genBatch: Gen[List[KafkaWire.Msg]] = for {
    base <- Gen.chooseNum(0L, 1L << 40)
    ts0 <- Gen.chooseNum(0L, 1L << 45)
    n <- Gen.chooseNum(1, 12)
    msgs <- Gen.listOfN(n, for {
      dts <- Gen.chooseNum(-1000L, 1000L)
      key <- Gen.option(genBytes)
      value <- genBytes
    } yield (dts, key.orNull, value))
  } yield msgs.zipWithIndex.map { case ((dts, k, v), i) =>
    KafkaWire.Msg(base + i, ts0 + dts, k, v)
  }

  property("varlong zigzag round-trips over the full Long range") =
    forAll { (v: Long) =>
      val w = new KafkaWire.Writer()
      KafkaWireV2.writeVarLong(w, v)
      val enc = w.result
      KafkaWireV2.readVarLong(new KafkaWire.Reader(enc)) == v &&
        enc.length == KafkaWireV2.varLongSize(v)
    }

  property("record batch round-trips: offsets, timestamps, keys, values") =
    forAll(genBatch) { msgs =>
      val decoded = KafkaWireV2.decodeRecordBatches(KafkaWireV2.encodeRecordBatch(msgs))
      decoded.size == msgs.size && decoded.zip(msgs).forall { case (d, m) =>
        d.offset == m.offset && d.timestamp == m.timestamp &&
          java.util.Arrays.equals(d.value, m.value) &&
          ((d.key == null && m.key == null) || java.util.Arrays.equals(d.key, m.key))
      }
    }

  property("concatenated batches decode in order") =
    forAll(genBatch, genBatch) { (a, b) =>
      // rebase b after a so offsets stay ascending, like a real log
      val b2 = b.zipWithIndex.map { case (m, i) =>
        m.copy(offset = a.last.offset + 1 + i)
      }
      val bytes = KafkaWireV2.encodeRecordBatch(a) ++ KafkaWireV2.encodeRecordBatch(b2)
      KafkaWireV2.decodeRecordBatches(bytes).map(_.offset) ==
        (a ++ b2).map(_.offset).toVector
    }

  property("any single-byte corruption past the crc field is detected") =
    forAll(genBatch, Gen.chooseNum(0, Int.MaxValue)) { (msgs, seed) =>
      val batch = KafkaWireV2.encodeRecordBatch(msgs)
      // layout: baseOffset(8) batchLength(4) leaderEpoch(4) magic(1) crc(4)
      // → the crc'd section starts at byte 21
      val pos = 21 + (seed % (batch.length - 21))
      val bad = batch.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      Prop.throws(classOf[IllegalArgumentException]) {
        KafkaWireV2.decodeRecordBatches(bad)
      }
    }

  property("a truncated trailing batch is dropped, never mis-decoded") =
    forAll(genBatch, Gen.chooseNum(1, 20)) { (msgs, cut) =>
      val full = KafkaWireV2.encodeRecordBatch(msgs)
      val trunc = full.take(full.length - (cut % full.length).max(1))
      // decode must either produce no messages (partial batch dropped) or
      // throw nothing — never fabricate records
      val out = try KafkaWireV2.decodeRecordBatches(trunc)
      catch { case _: IllegalArgumentException => Vector.empty }
      out.isEmpty
    }
}
