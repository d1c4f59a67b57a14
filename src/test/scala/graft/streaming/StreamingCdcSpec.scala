package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.MqttPipeline

/** The incremental-equals-batch property (SURVEY §5.2d) through the ACTUAL
  * streaming operator: [[StatefulCdc.changes]] driven by MemoryStream over
  * multiple micro-batches must emit exactly the rows the batch `lag`-window
  * replay ([[MqttPipeline.history]]) keeps — per-topic GroupState carrying
  * the last payload across triggers is the live form of the trigger reading
  * the stored row (/root/reference/mysql.sql:86-91).
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private def msg(id: Long, t: Long, topic: String, v: String) =
    MqttMsg(id, ts(t), topic, v.getBytes("UTF-8"), 0, 0)

  private def batchHistoryIds(msgs: Seq[MqttMsg]): Set[Long] = {
    val df: DataFrame = msgs
      .map(m => (m.msg_id, m.ts, m.topic, m.value, m.qos, m.retain))
      .toDF("msg_id", "ts", "topic", "value", "qos", "retain")
    MqttPipeline.history(df).select($"msg_id").as[Long].collect().toSet
  }

  test("streaming CDC over micro-batches equals the batch lag-window replay") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MqttMsg]
    val q = StatefulCdc.changes(input.toDS())
      .writeStream.format("memory").queryName("cdc_eq").outputMode("append").start()
    val b1 = Seq(msg(1, 10, "t", "a"), msg(2, 11, "t", "a"), msg(3, 12, "u", "q"))
    val b2 = Seq(msg(4, 13, "t", "b"), msg(5, 14, "u", "q")) // u unchanged across batches
    val b3 = Seq(msg(6, 15, "t", "b"), msg(7, 16, "t", "c"), msg(8, 17, "u", "r"))
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cdc_eq").as[CdcEvent].collect().map(_.msg_id).toSet
    // suppression must work WITHIN a batch (2, 6) and ACROSS batches (5):
    // only state carried between triggers can suppress 5
    assert(streamed == Set(1L, 3L, 4L, 7L, 8L))
    assert(streamed == batchHistoryIds(b1 ++ b2 ++ b3))
  }

  test("binary payloads diff by content, not reference, through GroupState") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MqttMsg]
    val q = StatefulCdc.changes(input.toDS())
      .writeStream.format("memory").queryName("cdc_bin").outputMode("append").start()
    input.addData(Seq(MqttMsg(1, ts(10), "t", Array[Byte](0, 1), 0, 0)))
    q.processAllAvailable()
    // same bytes, fresh array: must be suppressed (Arrays.equals, not eq)
    input.addData(Seq(MqttMsg(2, ts(11), "t", Array[Byte](0, 1), 0, 0),
      MqttMsg(3, ts(12), "t", Array.emptyByteArray, 0, 0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cdc_bin").as[CdcEvent].collect().map(_.msg_id).toSet
    assert(got == Set(1L, 3L))
  }

  test("checkpoint restart resumes state: no duplicated and no lost rows") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("cdc_ckpt").toFile.getAbsolutePath
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val input = MemoryStream[MqttMsg]
    def start() = StatefulCdc.changes(input.toDS())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    input.addData(Seq(msg(1, 10, "t", "a"), msg(2, 11, "u", "x")))
    q1.processAllAvailable()
    q1.stop() // graceful: batch committed to the checkpoint before returning

    // restart from the same checkpoint; the restored per-topic state must
    // suppress the unchanged repeats (3, 5) and keep the real change (4)
    input.addData(Seq(msg(3, 12, "t", "a"), msg(4, 13, "t", "b"), msg(5, 14, "u", "x")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out).as[CdcEvent].collect().map(_.msg_id).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("graceful shutdown hook stops active queries and restart loses nothing") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("cdc_shut").toFile.getAbsolutePath
    val input = MemoryStream[MqttMsg]
    def start() = StatefulCdc.changes(input.toDS())
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    start()
    input.addData(Seq(msg(1, 10, "t", "a")))
    spark.streams.active.foreach(_.processAllAvailable())
    val hook = GracefulShutdown.install(spark)
    GracefulShutdown.stopAll(spark) // what the JVM hook runs at SIGTERM
    assert(GracefulShutdown.uninstall(hook))
    assert(spark.streams.active.isEmpty)

    input.addData(Seq(msg(2, 11, "t", "a"), msg(3, 12, "t", "b")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(s"$dir/out").as[CdcEvent].collect().map(_.msg_id).toSet
    assert(got == Set(1L, 3L)) // 2 suppressed by state surviving the shutdown
  }
}
