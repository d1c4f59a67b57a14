package graft.sources.mqtt

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The complete live front door over real sockets: [[MiniMqttServer]]
  * (loopback TCP) -> [[SocketMqttTransport]] -> [[MqttClient]] (exclude
  * drop) -> [[MqttBroker]] buffer -> [[MqttSourceProvider]] DSv2
  * micro-batches — the composition the reference runs as
  * paho -> on_message -> write2sql (/root/reference/mqtt2sql.py:762-787),
  * with Structured Streaming standing where the SQL writer thread stood.
  */
class LiveIngestSpec extends SparkSpec {

  private def eventually(ms: Long = 5000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(10)
    cond
  }

  test("socket-ingested messages flow into DSv2 micro-batches end to end") {
    val server = new MiniMqttServer()
    val broker = "live_ingest_test"
    MqttBroker.clear(broker)
    try {
      val transport = new SocketMqttTransport()
      val client = MqttClient.forBroker(broker, transport, MqttClient.Options(
        MqttConfig.Endpoint("mqtt", server.host, server.port, None, None, None, tls = false),
        subscriptions = Seq("tele/#"),
        excludeTopics = Set("tele/skip"),
        connectTimeoutMs = 2000))
      assert(client.connectOnce().isEmpty)
      assert(eventually()(server.subscriptionCount == 1))
      (1 to 5).foreach(i =>
        server.publish(s"tele/dev$i", s"v$i".getBytes(StandardCharsets.UTF_8)))
      server.publish("tele/skip", "excluded".getBytes(StandardCharsets.UTF_8))
      server.publish("tele/dev9", "last".getBytes(StandardCharsets.UTF_8))
      // 6 survivors (5 + dev9); the excluded topic never reaches the buffer
      assert(eventually()(MqttBroker.size(broker) == 6L),
        s"buffer has ${MqttBroker.size(broker)} messages")
      val name = "live_ingest_sink"
      val q = spark.readStream.format("graft.sources.mqtt.MqttSourceProvider")
        .option("broker", broker).load()
        .writeStream.format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      try {
        val rows = spark.table(name).select("topic", "value").collect()
          .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), StandardCharsets.UTF_8)))
        assert(rows.length == 6)
        assert(rows.toSet ==
          ((1 to 5).map(i => (s"tele/dev$i", s"v$i")).toSet + (("tele/dev9", "last"))))
      } finally {
        try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      }
      transport.disconnect()
    } finally {
      server.close()
      MqttBroker.clear(broker)
    }
  }
}
