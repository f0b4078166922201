package graft.kafka

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the hand-rolled Kafka codec: message-set round-trip
  * (decode ∘ encode = id, offsets/timestamps/payloads preserved), CRC
  * tamper detection at EVERY byte position past the crc field, request
  * round-trips for all four APIs, and the broker's truncation rule
  * (a partial trailing message drops cleanly, like real consumers). */
object KafkaWireProps extends Properties("KafkaWire") {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  private val genMsg: Gen[KafkaWire.Msg] = for {
    off <- Gen.chooseNum(0L, 1L << 40)
    ts <- Gen.chooseNum(0L, 1L << 45)
    key <- Gen.option(genBytes)
    value <- genBytes
  } yield KafkaWire.Msg(off, ts, key.orNull, value)

  property("message set round-trips: offsets, timestamps, keys, values") =
    forAll(Gen.listOf(genMsg)) { msgs =>
      val decoded = KafkaWire.decodeMessageSet(KafkaWire.encodeMessageSet(msgs))
      decoded.size == msgs.size && decoded.zip(msgs).forall { case (d, m) =>
        d.offset == m.offset && d.timestamp == m.timestamp &&
          java.util.Arrays.equals(d.value, m.value) &&
          ((d.key == null && m.key == null) || java.util.Arrays.equals(d.key, m.key))
      }
    }

  property("any single-byte corruption past the crc field is detected") =
    forAll(genMsg, Gen.chooseNum(0, Int.MaxValue)) { (msg, seed) =>
      val set = KafkaWire.encodeMessageSet(Seq(msg))
      // corrupt one byte inside the message body (after offset+size+crc,
      // i.e. position >= 16), chosen from the seed
      val pos = 16 + (seed % (set.length - 16))
      val bad = set.clone()
      bad(pos) = (bad(pos) ^ 0x5a).toByte
      Prop.throws(classOf[IllegalArgumentException]) {
        KafkaWire.decodeMessageSet(bad)
      }
    }

  property("a partial trailing message is dropped, prior messages survive") =
    forAll(Gen.nonEmptyListOf(genMsg), Gen.chooseNum(1, 11)) { (msgs, cut) =>
      val whole = KafkaWire.encodeMessageSet(msgs)
      val lastLen = KafkaWire.encodeMessageSet(Seq(msgs.last)).length
      // keep all complete messages plus a truncated slice of the last one
      // (stop before its crc is fully checkable: cut ≤ 11 < 12-byte header)
      val truncated = java.util.Arrays.copyOf(whole, whole.length - lastLen + cut)
      val decoded = KafkaWire.decodeMessageSet(truncated)
      decoded.size == msgs.size - 1
    }

  private val genTopic: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(30))

  property("produce request round-trips") =
    forAll(genTopic, Gen.chooseNum(0, 64), Gen.listOf(genMsg)) { (topic, part, msgs) =>
      val set = KafkaWire.encodeMessageSet(msgs)
      val q = KafkaWire.ProduceRequest(-1, 10000, topic, part, set)
      val d = KafkaWire.decodeProduceRequest(
        new KafkaWire.Reader(KafkaWire.encodeProduceRequest(q)))
      d.acks == q.acks && d.timeoutMs == q.timeoutMs && d.topic == topic &&
        d.partition == part && java.util.Arrays.equals(d.messageSet, set)
    }

  property("fetch and list-offsets requests round-trip") =
    forAll(genTopic, Gen.chooseNum(0, 64), Gen.chooseNum(0L, 1L << 50)) { (topic, part, off) =>
      val f = KafkaWire.FetchRequest(500, 1, 1 << 20, topic, part, off, 1 << 20)
      val fd = KafkaWire.decodeFetchRequest(
        new KafkaWire.Reader(KafkaWire.encodeFetchRequest(f)))
      val lo = KafkaWire.ListOffsetsRequest(topic, part, KafkaWire.TimestampLatest)
      val lod = KafkaWire.decodeListOffsetsRequest(
        new KafkaWire.Reader(KafkaWire.encodeListOffsetsRequest(lo)))
      fd == f && lod == lo
    }

  property("responses round-trip, including negative throttle/base sentinels") =
    forAll(genTopic, Gen.chooseNum(0, 64), Gen.chooseNum(-1L, 1L << 50)) { (topic, part, base) =>
      val pr = KafkaWire.ProduceResponse(topic, part, 0, base, 123L, 0)
      val prd = KafkaWire.decodeProduceResponse(
        new KafkaWire.Reader(KafkaWire.encodeProduceResponse(pr)))
      val lor = KafkaWire.ListOffsetsResponse(topic, part, 0, -1L, base)
      val lord = KafkaWire.decodeListOffsetsResponse(
        new KafkaWire.Reader(KafkaWire.encodeListOffsetsResponse(lor)))
      prd == pr && lord == lor
    }
}
