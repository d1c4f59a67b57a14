package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD-2 intervalization of the CDC history: per-key interval chaining,
  * exactly one open (current) interval per key, row-for-row coverage of the
  * history log.
  */
class HistoryScd2Spec extends SparkSpec {
  import spark.implicits._

  test("intervals chain per topic and exactly one open interval per topic") {
    val scd = MqttQueries.historyScd2(spark, sf0001)
      .select($"id", $"topicid", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Long, java.time.LocalDateTime, Option[java.time.LocalDateTime], Int)]
      .collect()
    assert(scd.nonEmpty)
    scd.groupBy(_._2).foreach { case (topicid, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(r => (r._3, r._1))
      // each interval's valid_to is the NEXT change's valid_from
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"topic $topicid: ${a._4} != ${b._3}")
        case _ => ()
      }
      // the last (and only the last) interval is open/current
      assert(rows.last._4.isEmpty && rows.last._5 == 1)
      assert(rows.init.forall(r => r._4.nonEmpty && r._5 == 0))
    }
  }

  test("SCD-2 covers the history log row for row (same ids, same count)") {
    val histIds = MqttQueries.history(spark, sf0001)
      .select($"id").as[Long].collect().toSet
    val scdIds = MqttQueries.historyScd2(spark, sf0001)
      .select($"id").as[Long].collect().toSet
    assert(scdIds == histIds && histIds.nonEmpty)
  }
}
