package graft.operators

import graft.SparkSpec

/** Cadence semantics against the certified kept-row set: counts equal the
  * history table's per-topic rows, spans are exact micros-derived ms, and
  * single-change topics report dwell 0.
  */
class HistoryStatsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("per-topic counts equal the history table; dwell is span div (n-1)") {
    val stats = MqttQueries.historyStats(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(stats.nonEmpty)
    val kept = MqttPipeline.historyKept(
        MqttQueries.replayMessages(spark, sf0001))
      .groupBy(col("topic")).count()
      .as[(String, Long)].collect().toMap
    stats.foreach { case (topic, n, span, dwell) =>
      assert(n == kept(topic), s"$topic count mismatch")
      assert(span >= 0)
      if (n > 1) assert(dwell == span / (n - 1), s"$topic dwell formula")
      else assert(dwell == 0L && span == 0L, s"$topic single-change shape")
    }
    assert(stats.map(_._2).sum == kept.values.sum)
  }
}
