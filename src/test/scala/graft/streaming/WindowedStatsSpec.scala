package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Watermarked event-time windows (ST2): append mode emits each window
  * exactly once when the watermark passes its end, state is evicted, and
  * later-than-watermark stragglers are dropped (and counted).
  */
class WindowedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def msg(id: Long, t: Timestamp, topic: String) =
    MqttMsg(id, t, topic, "x".getBytes("UTF-8"), 0, 0)

  test("windows close at the watermark; late events are dropped, not resurrected") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MqttMsg]
    val q = WindowedStats.hourlyStats(input.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("win_stats").outputMode("append").start()

    // batch 1: two msgs in H10 (10:00-11:00), one in H11 -> nothing closes yet
    input.addData(Seq(msg(1, at("10:10"), "t"), msg(2, at("10:20"), "t"),
      msg(3, at("11:05"), "t")))
    q.processAllAvailable()
    assert(spark.table("win_stats").count() == 0)

    // batch 2: advance event time to 12:00 (watermark lags one batch)
    input.addData(Seq(msg(4, at("12:00"), "t")))
    q.processAllAvailable()

    // batch 3: a straggler inside already-final H10 — watermark is now 11:30,
    // so H10 (end 11:00) closes THIS batch and the straggler is dropped
    input.addData(Seq(msg(5, at("10:30"), "t")))
    q.processAllAvailable()
    val afterClose = spark.table("win_stats")
      .select($"win_start", $"n_msgs").as[(Timestamp, Long)].collect().toSet
    assert(afterClose == Set((at("10:00"), 2L))) // 2, NOT 3: straggler excluded

    // batch 4: push the watermark past everything -> H11 and H12 finalize
    input.addData(Seq(msg(6, at("14:00"), "t")))
    q.processAllAvailable()
    input.addData(Seq(msg(7, at("16:00"), "t")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("win_stats")
      .select($"win_start", $"n_msgs").as[(Timestamp, Long)].collect().toSet
    assert(all.contains((at("10:00"), 2L)))
    assert(all.contains((at("11:00"), 1L)))
    assert(all.contains((at("12:00"), 1L)))
    // the drop was counted, never silent
    val dropped = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    assert(dropped >= 1)
  }
}
