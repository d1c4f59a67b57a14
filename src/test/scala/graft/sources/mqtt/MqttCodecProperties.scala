package graft.sources.mqtt

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the MQTT 3.1.1 wire codec: arbitrary packets
  * must survive the write/read round trip byte-exactly — in particular
  * across the remaining-length varint width boundaries (127 / 128, 16383 /
  * 16384, §2.2.3) that the scripted end-to-end specs' small payloads never
  * reach — and packet sequences must frame without bleeding into each
  * other. Body codecs (CONNECT, PUBLISH, SUBSCRIBE) round-trip through
  * their parsers, UTF-8 multibyte topics included.
  */
object MqttCodecProperties extends Properties("MqttCodec") {

  import MqttCodec._

  private val payloadGen: Gen[Array[Byte]] = Gen.frequency(
    3 -> Gen.choose(0, 64),
    // straddle the 1->2 byte and 2->3 byte varint boundaries
    2 -> Gen.choose(120, 140),
    1 -> Gen.choose(16380, 16390),
    1 -> Gen.choose(0, 70000)
  ).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  private val topicGen: Gen[String] = for {
    n <- Gen.choose(1, 5)
    levels <- Gen.listOfN(n, Gen.oneOf("tele", "a", "sensor7", "ü", "日本語", "x-y_z"))
  } yield levels.mkString("/")

  private val typeGen: Gen[Int] =
    Gen.oneOf(CONNECT, CONNACK, PUBLISH, SUBSCRIBE, SUBACK, PINGREQ, DISCONNECT)

  property("packets round-trip byte-exactly across varint width boundaries") =
    forAll(typeGen, Gen.choose(0, 15), payloadGen) { (ptype, flags, body) =>
      val out = new ByteArrayOutputStream()
      writePacket(out, ptype, flags, body)
      val p = readPacket(new ByteArrayInputStream(out.toByteArray))
      p.ptype == ptype && p.flags == flags && java.util.Arrays.equals(p.body, body)
    }

  property("packet sequences frame cleanly (no bleed between packets)") =
    forAll(Gen.listOfN(5, payloadGen)) { bodies =>
      val out = new ByteArrayOutputStream()
      bodies.foreach(b => writePacket(out, PUBLISH, 0, b))
      val in = new ByteArrayInputStream(out.toByteArray)
      bodies.forall(b => java.util.Arrays.equals(readPacket(in).body, b))
    }

  property("CONNECT bodies round-trip (credentials, clean session, keepalive)") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.oneOf(true, false),
      Gen.choose(0, 0xFFFF), Gen.option(Gen.alphaNumStr),
      Gen.option(Gen.alphaNumStr)) { (cid, clean, keepalive, user, pass) =>
      val info = parseConnect(connectBody(cid, clean, keepalive, user, pass))
      // a password without a username is not encodable (§3.1.2.9): the
      // codec drops it, matching the flag rules
      val expectPass = if (user.isDefined) pass else None
      info.clientId == cid && info.cleanSession == clean &&
        info.keepaliveSec == keepalive && info.username == user &&
        info.password == expectPass
    }

  property("QoS-0 PUBLISH bodies round-trip with multibyte UTF-8 topics") =
    forAll(topicGen, payloadGen) { (topic, payload) =>
      val pub = parsePublish(0, publishBody(topic, payload))
      pub.topic == topic && java.util.Arrays.equals(pub.payload, payload) &&
        pub.qos == 0 && !pub.retain && pub.packetId.isEmpty
    }

  property("SUBSCRIBE bodies round-trip, multibyte filters included") =
    forAll(Gen.choose(1, 0xFFFF), Gen.nonEmptyListOf(topicGen)) { (pid, filters) =>
      // encode n filters by concatenating single-filter bodies after the id
      val body = filters.foldLeft(subscribeBody(pid, filters.head, 0).take(2)) {
        (acc, f) => acc ++ subscribeBody(pid, f, 0).drop(2)
      }
      val sub = parseSubscribe(body)
      sub.packetId == pid && sub.filters.map(_._1) == filters
    }
}
