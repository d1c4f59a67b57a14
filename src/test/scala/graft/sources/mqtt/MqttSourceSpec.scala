package graft.sources.mqtt

import graft.SparkSpec

/** The DSv2 MQTT source end-to-end: publish -> readStream -> rows; plus the
  * two lifecycle contracts the reference's long-running deployment depends
  * on — committed offsets RELEASE driver memory (the buffer must not grow
  * without bound), and `maxOffsetsPerTrigger` bounds each micro-batch (the
  * reference's BoundedSemaphore backpressure,
  * /root/reference/mqtt2sql.py:121,461,784).
  */
class MqttSourceSpec extends SparkSpec {
  import spark.implicits._

  private def publish(broker: String, n: Int, topicOf: Int => String): Unit =
    (0 until n).foreach { i =>
      MqttBroker.publish(broker, topicOf(i), s"payload-$i".getBytes("UTF-8"),
        tsMicros = 1700000000000000L + i * 1000000L)
    }

  private def stream(broker: String, extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft.sources.mqtt.MqttSourceProvider")
      .option("broker", broker).option("subscribe", "tele/+/SENSOR")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("subscription filter is applied at the source; rows arrive in order") {
    val broker = "b_filter"
    MqttBroker.clear(broker)
    publish(broker, 4, i => s"tele/dev$i/SENSOR")
    publish(broker, 2, i => s"stat/dev$i/POWER") // must never reach the engine
    val q = stream(broker).writeStream
      .format("memory").queryName("src_rows").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("src_rows")
      .select($"msg_id", $"topic", $"value".cast("string"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(rows == (0 until 4).map(i => (i.toLong, s"tele/dev$i/SENSOR", s"payload-$i")))
    MqttBroker.clear(broker)
  }

  test("committed offsets trim the driver buffer (memory is released)") {
    val broker = "b_trim"
    MqttBroker.clear(broker)
    publish(broker, 10, i => s"tele/dev$i/SENSOR")
    val q = stream(broker).writeStream
      .format("memory").queryName("src_trim").outputMode("append").start()
    q.processAllAvailable()
    // the first batch's commit fires by the time a subsequent batch runs
    publish(broker, 3, i => s"tele/extra$i/SENSOR")
    q.processAllAvailable()
    publish(broker, 1, _ => "tele/last/SENSOR")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("src_trim").count() == 14)
    // high-water mark is absolute and survives trimming; resident messages
    // are at most the uncommitted tail, never the whole stream
    assert(MqttBroker.size(broker) == 14L)
    assert(MqttBroker.retained(broker) <= 4)
    MqttBroker.clear(broker)
  }

  test("maxOffsetsPerTrigger bounds each micro-batch and drains the backlog") {
    val broker = "b_limit"
    MqttBroker.clear(broker)
    publish(broker, 10, i => s"tele/dev$i/SENSOR")
    val q = stream(broker, Map("maxOffsetsPerTrigger" -> "3")).writeStream
      .format("memory").queryName("src_limit").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("src_limit").count() == 10) // backlog fully drained
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4) // 10 rows at <= 3/trigger needs >= 4 batches
    assert(batches.forall(_.numInputRows <= 3))
    MqttBroker.clear(broker)
  }

  test("connection loss: stream survives, QoS-0 messages drop, delivery resumes on reconnect") {
    val broker = "b_conn"
    MqttBroker.clear(broker)
    publish(broker, 3, i => s"tele/dev$i/SENSOR")
    val q = stream(broker).writeStream
      .format("memory").queryName("src_conn").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("src_conn").count() == 3)

    MqttBroker.dropConnection(broker)
    publish(broker, 2, i => s"tele/down$i/SENSOR") // lost: broker queues nothing at QoS 0
    q.processAllAvailable() // no progress, but the query must NOT die
    assert(q.isActive)
    assert(spark.table("src_conn").count() == 3)
    assert(MqttBroker.lostCount(broker) == 2)

    MqttBroker.restoreConnection(broker)
    publish(broker, 2, i => s"tele/up$i/SENSOR")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("src_conn").count() == 5) // resumed exactly where it left off
    assert(MqttBroker.reconnectCount(broker) == 1)
    MqttBroker.clear(broker)
  }

  test("offsets are replayable before commit: restart re-reads the uncommitted tail") {
    val broker = "b_replay"
    MqttBroker.clear(broker)
    publish(broker, 5, i => s"tele/dev$i/SENSOR")
    val dir = java.nio.file.Files.createTempDirectory("mqtt_src").toFile.getAbsolutePath
    def start() = stream(broker).writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    publish(broker, 2, i => s"tele/more$i/SENSOR")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // exactly once per message across the restart: 5 + 2, no dups, no loss
    val ids = spark.read.parquet(s"$dir/out").select($"msg_id").as[Long].collect().toSeq
    assert(ids.sorted == (0L until 7L))
    MqttBroker.clear(broker)
  }
}
