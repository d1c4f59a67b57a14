package graft.operators

import graft.SparkSpec

/** Staleness-histogram semantics: topic conservation, the zero band for
  * the newest topic, and band ordering.
  */
class StaleTopicsSpec extends SparkSpec {
  import spark.implicits._

  test("the histogram conserves topics and anchors at the newest") {
    val nTopics = MqttQueries.replayMessages(spark, sf0001)
      .select("topic").distinct().count()
    val got = MqttQueries.staleTopics(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == nTopics)
    // the newest topic has age 0 -> decade 0 present with min 0
    assert(got.head._1 == 0L && got.head._3 == 0L)
    got.foreach { r => assert(r._3 >= 0 && r._3 <= r._4) }
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }
}
