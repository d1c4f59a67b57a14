package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Session windows under a streaming watermark (the merging window family's
  * ST2 form, pairing WindowedStatsSpec's tumbling coverage): sessions extend
  * while events arrive within the gap — across micro-batches — and finalize
  * once the watermark passes session end (last event + gap).
  */
class SessionWindowStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def msg(id: Long, t: Timestamp, topic: String) =
    MqttMsg(id, t, topic, "x".getBytes("UTF-8"), 0, 0)

  test("sessions merge across micro-batches and close at the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MqttMsg]
    val sessions = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("topic"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("topic"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n"))
    val q = sessions.writeStream
      .format("memory").queryName("sess_stream").outputMode("append").start()

    // batch 1: two events 20 min apart -> ONE session (gap 30)
    input.addData(Seq(msg(1, at("10:00"), "t"), msg(2, at("10:20"), "t")))
    q.processAllAvailable()
    // batch 2: extends the same session across the batch boundary (10:45 is
    // within 30 min of 10:20's session end)
    input.addData(Seq(msg(3, at("10:45"), "t")))
    q.processAllAvailable()
    assert(spark.table("sess_stream").count() == 0) // nothing finalized yet

    // batch 3: a much later event pushes the watermark past 10:45+30
    input.addData(Seq(msg(4, at("13:00"), "t")))
    q.processAllAvailable()
    input.addData(Seq(msg(5, at("15:00"), "t")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_stream")
      .select($"s", $"e", $"n").as[(Timestamp, Timestamp, Long)].collect().toSet
    // one 3-event session [10:00, 11:15) — merged ACROSS batches — plus the
    // 13:00 singleton finalized by the 15:00 event
    assert(rows.contains((at("10:00"), at("11:15"), 3L)), rows)
    assert(rows.contains((at("13:00"), at("13:30"), 1L)), rows)
  }
}
