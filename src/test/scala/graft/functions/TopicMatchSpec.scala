package graft.functions

import graft.SparkSpec

/** MQTT 3.1.1 §4.7 topic-filter semantics (reference subscribes with such
  * filters, /root/reference/mqtt2sql.py:753-760, mqtt2sql.conf:33).
  */
class TopicMatchSpec extends SparkSpec {

  private def m(topic: String, filter: String): Boolean =
    MqttTopicMatches.matches(topic, filter)

  test("exact literal match") {
    assert(m("tele/dev/SENSOR", "tele/dev/SENSOR"))
    assert(!m("tele/dev/SENSOR", "tele/dev/STATE"))
    assert(!m("tele/dev", "tele/dev/SENSOR"))
  }

  test("+ matches exactly one level") {
    assert(m("tele/dev1/SENSOR", "tele/+/SENSOR"))
    assert(!m("tele/a/b/SENSOR", "tele/+/SENSOR"))
    assert(!m("tele/SENSOR", "tele/+/SENSOR"))
    assert(m("a/b", "+/+"))
    assert(!m("a", "+/+"))
  }

  test("# matches any suffix including zero levels") {
    assert(m("topic2/x/sub/deep/er", "topic2/+/sub/#"))
    assert(m("topic2/x/sub", "topic2/+/sub/#"))   // zero levels after #
    assert(!m("topic2/x/other", "topic2/+/sub/#"))
    assert(m("anything/at/all", "#"))
    assert(m("a", "#"))
  }

  test("regex metacharacters in topics are literal") {
    assert(m("a.b/c", "a.b/c"))
    assert(!m("aXb/c", "a.b/c"))
  }

  test("works as a Column predicate with codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("tele/d1/7", "tele/d2/8", "other/d1/7").toDF("topic")
    val got = df.filter(MqttTopicMatches(col("topic"), "tele/+/7"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("tele/d1/7"))
  }
}
