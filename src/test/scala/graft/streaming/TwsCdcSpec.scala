package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.MqttQueries

/** The transformWithState (Spark 4 state API, RocksDB store) form of the
  * CDC machine: same semantics as the flatMapGroupsWithState form, proven
  * by the same assertions.
  */
class TwsCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private def msg(id: Long, t: Long, topic: String, v: String) =
    MqttMsg(id, ts(t), topic, v.getBytes("UTF-8"), 0, 0)

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, TwsCdc.RocksDbProvider)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState CDC equals the batch lag-window replay") {
    implicit val ctx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[MqttMsg]
      val q = TwsCdc.changes(input.toDS())
        .writeStream.format("memory").queryName("tws_cdc_eq")
        .outputMode("append").start()
      val b1 = Seq(msg(1, 10, "t", "a"), msg(2, 11, "t", "a"), msg(3, 12, "u", "q"))
      val b2 = Seq(msg(4, 13, "t", "b"), msg(5, 14, "u", "q"))
      val b3 = Seq(msg(6, 15, "t", "b"), msg(7, 16, "t", "c"), msg(8, 17, "u", "r"))
      try {
        Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
        val streamed = spark.table("tws_cdc_eq").as[CdcEvent]
          .collect().map(_.msg_id).toSet
        // within-batch suppression (2, 6) and ACROSS batches through the
        // RocksDB ValueState (5)
        assert(streamed == Set(1L, 3L, 4L, 7L, 8L))
      } finally q.stop()
    }
  }

  test("driver query form: file-source replay through transformWithState equals batch") {
    val batch = MqttQueries.history(spark, sf0001).collect()
      .map(_.toSeq.map { case b: Array[Byte] => b.toSeq; case x => x }).toSeq
    val streamed = FileReplayHistory.history(spark, sf0001, useTws = true)
      .collect()
      .map(_.toSeq.map { case b: Array[Byte] => b.toSeq; case x => x }).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }
}
