package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trigger-semantics edge cases from FIXTURES.md §1.5 (derived from
  * /root/reference/mysql.sql:67-91 and README.md:207-251).
  */
class MqttPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** (msg_id, ts, topic, value) quick frame builder. */
  private def msgs(rows: (Long, Long, String, String)*): DataFrame =
    rows.toSeq
      .map { case (id, t, topic, v) => (id, ts(t), topic, v.getBytes("UTF-8"), 0, 0) }
      .toDF("msg_id", "ts", "topic", "value", "qos", "retain")

  test("state table keeps exactly the latest message per topic, ids contiguous in first-arrival order") {
    val m = msgs(
      (1, 10, "b", "b1"), (2, 11, "a", "a1"), (3, 12, "b", "b2"), (4, 13, "a", "a2"))
    val st = MqttPipeline.stateTable(m).orderBy("id")
      .select($"id", $"topic", $"value".cast("string"))
      .as[(Long, String, String)].collect().toSeq
    // b arrived first -> id 1; latest values win
    assert(st == Seq((1L, "b", "b2"), (2L, "a", "a2")))
  }

  test("same-topic same-payload repeat writes no history row (diffonly=1 default)") {
    val m = msgs((1, 10, "t", "x"), (2, 11, "t", "x"), (3, 12, "t", "y"), (4, 13, "t", "y"))
    val h = MqttPipeline.history(m).select($"msg_id").as[Long].collect().toSeq.sorted
    assert(h == Seq(1L, 3L)) // first insert + the one change
  }

  test("diffonly=0 records every message; enable=0 records none") {
    val m = msgs((1, 10, "t", "x"), (2, 11, "t", "x"), (3, 12, "u", "x"), (4, 13, "u", "x"))
    val flags = Seq(("t", 1, 0), ("u", 0, 1))
      .toDF("topic", "history_enable", "history_diffonly")
    val h = MqttPipeline.history(m, Some(flags))
      .select($"msg_id").as[Long].collect().toSeq.sorted
    assert(h == Seq(1L, 2L)) // t: both (diffonly=0); u: none (enable=0)
  }

  test("unknown topics default to enable=1 diffonly=1 when flags are partial") {
    val m = msgs((1, 10, "t", "x"), (2, 11, "t", "x"))
    val flags = Seq(("other", 0, 0)).toDF("topic", "history_enable", "history_diffonly")
    val h = MqttPipeline.history(m, Some(flags)).select($"msg_id").as[Long].collect().toSeq
    assert(h == Seq(1L)) // insert recorded, repeat suppressed
  }

  test("empty and binary payloads diff correctly") {
    val rows = Seq(
      (1L, ts(10), "t", Array.emptyByteArray, 0, 0),
      (2L, ts(11), "t", Array[Byte](0, 1, 2), 0, 0),
      (3L, ts(12), "t", Array[Byte](0, 1, 2), 0, 0),
      (4L, ts(13), "t", Array.emptyByteArray, 0, 0))
    val m = rows.toDF("msg_id", "ts", "topic", "value", "qos", "retain")
    val h = MqttPipeline.history(m).select($"msg_id").as[Long].collect().toSeq.sorted
    assert(h == Seq(1L, 2L, 4L))
  }

  test("exclude filter is exact membership, not wildcard") {
    val m = msgs((1, 10, "tele/error/13", "x"), (2, 11, "tele/error/134", "y"),
      (3, 12, "tele/error", "z"))
    val kept = MqttPipeline.excludeTopics(m, Seq("tele/error/13"))
      .select($"msg_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 3L)) // prefix-sharing topics survive
  }

  test("duplicate timestamps disambiguated by msg_id (README.md:251 order)") {
    val m = msgs((2, 10, "t", "b"), (1, 10, "t", "a"), (3, 10, "t", "c"))
    val st = MqttPipeline.stateTable(m).select($"value".cast("string")).as[String].collect()
    assert(st.toSeq == Seq("c")) // highest msg_id wins at equal ts
    val h = MqttPipeline.history(m)
      .orderBy("id").select($"value".cast("string")).as[String].collect()
    assert(h.toSeq == Seq("a", "b", "c")) // arrival order a,b,c
  }

  test("history view joins every history row (FK totality) with ts_last from state") {
    val m = msgs((1, 10, "t", "x"), (2, 11, "t", "y"), (3, 12, "u", "z"))
    val h = MqttPipeline.history(m)
    val v = MqttPipeline.historyView(h, MqttPipeline.stateTable(m))
    assert(v.count() == h.count())
    val tsLast = v.filter($"topic" === "t").select($"ts_last").distinct()
      .as[Timestamp].collect().toSeq
    assert(tsLast == Seq(ts(11))) // parent mqtt.ts = last receive
  }

  test("incremental equals batch: replaying a prefix then suffix gives the same history") {
    val all = msgs((1, 10, "t", "a"), (2, 11, "t", "a"), (3, 12, "t", "b"),
      (4, 13, "u", "q"), (5, 14, "t", "b"), (6, 15, "t", "c"))
    val whole = MqttPipeline.history(all)
      .select($"msg_id").as[Long].collect().toSeq.sorted
    // batch-replay the same semantics in two halves, threading last state
    // through: the second half sees the first half's final payloads
    val firstHalf = msgs((1, 10, "t", "a"), (2, 11, "t", "a"), (3, 12, "t", "b"))
    val secondWithCarry = msgs((3, 12, "t", "b"), // carried last payload per topic
      (4, 13, "u", "q"), (5, 14, "t", "b"), (6, 15, "t", "c"))
    val h1 = MqttPipeline.history(firstHalf).select($"msg_id").as[Long].collect().toSeq
    val h2 = MqttPipeline.history(secondWithCarry).select($"msg_id").as[Long].collect().toSeq
      .filter(_ > 3) // drop the carried seed row
    assert((h1 ++ h2).sorted == whole)
  }
}
