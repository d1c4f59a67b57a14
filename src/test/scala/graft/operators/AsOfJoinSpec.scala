package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics and plan shape of the union-merge as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val left = Seq(
    (1L, ts(10), "a"), (2L, ts(15), "a"), (3L, ts(20), "a"),
    (4L, ts(10), "b"), (5L, ts(30), "c"))
    .toDF("event_id", "ts", "k")
  private val right = Seq(
    (ts(10), "a", "x"), (ts(18), "a", "y"), (ts(12), "b", "p"))
    .toDF("rts", "k", "payload")

  test("backward as-of: latest right row at-or-before, left-join semantics") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts")
      .select($"event_id", $"payload", $"rts").as[(Long, Option[String], Option[Timestamp])]
      .collect().toSet
    assert(out == Set(
      (1L, Some("x"), Some(ts(10))), // equal ts: inclusive (at-or-before)
      (2L, Some("x"), Some(ts(10))), // 18 > 15: must NOT look forward
      (3L, Some("y"), Some(ts(18))),
      (4L, None, None),              // right row at 12 is after 10
      (5L, None, None)))             // key with no right rows at all
  }

  test("plan is one window over one shuffle: no join operator, no range explosion") {
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // all carried columns collapse into a single Window node
    assert(plan.split("\\bWindow\\b").length - 1 == 1, plan)
  }

  test("matches the naive range-join + argmax definition on the replay frame") {
    val m = MqttQueries.replayMessages(spark, sf0001).limit(2000)
      .select($"msg_id", $"ts", $"topic")
    val changes = MqttPipeline.history(MqttQueries.replayMessages(spark, sf0001))
      .groupBy($"topic", $"ts".as("change_ts"))
      .agg(org.apache.spark.sql.functions.max($"id").as("change_id"))
    val fast = AsOfJoin.asOf(m, changes, Seq("topic"), "ts", "change_ts")
      .select($"msg_id", $"change_id").as[(Long, Option[Long])].collect().toMap
    // oracle-by-definition: theta-join + per-left max (fine at test scale)
    val naive = m.as("l")
      .join(changes.as("r"), $"l.topic" === $"r.topic" && $"l.ts" >= $"r.change_ts", "left")
      .groupBy($"l.msg_id")
      .agg(org.apache.spark.sql.functions.max($"r.change_id").as("change_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }
}
