package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the MQTT filter compiler: the compiled regex
  * must agree with an independent recursive model of OASIS MQTT 3.1.1 §4.7
  * (written from the spec, not from the regex) on arbitrary topics/filters.
  * Levels are generated non-empty — the engine's `+` deliberately matches
  * one NON-empty level (see MqttTopicMatches scaladoc).
  */
object TopicMatchProperties extends Properties("MqttTopicMatches") {

  /** The spec, directly: '#' terminal matches any remainder (incl. none);
    * '+' matches exactly one level; literals match themselves.
    */
  private def model(t: List[String], f: List[String]): Boolean = (t, f) match {
    case (Nil, Nil) => true
    case (_, "#" :: Nil) => true
    case (th :: tt, fh :: ft) if fh == "+" || fh == th => model(tt, ft)
    case _ => false
  }

  private val level: Gen[String] =
    Gen.oneOf(Gen.oneOf("a", "b", "sensor", "tele", "7"),
      Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)))

  private val topicGen: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, level))

  private val filterGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 5)
    body <- Gen.listOfN(n, Gen.frequency(3 -> level, 2 -> Gen.const("+")))
    hash <- Gen.oneOf(true, false)
  } yield if (hash) body :+ "#" else body

  property("compiled regex agrees with the spec model") =
    forAll(topicGen, filterGen) { (t, f) =>
      val got = MqttTopicMatches.matches(t.mkString("/"), f.mkString("/"))
      got == model(t, f)
    }

  property("a filter matches itself when it has no wildcards") =
    forAll(topicGen) { t =>
      MqttTopicMatches.matches(t.mkString("/"), t.mkString("/"))
    }

  property("parent '#' filters match every extension of the parent") =
    forAll(topicGen, topicGen) { (parent, ext) =>
      val filter = (parent :+ "#").mkString("/")
      MqttTopicMatches.matches(parent.mkString("/"), filter) &&
        MqttTopicMatches.matches((parent ++ ext).mkString("/"), filter)
    }
}
