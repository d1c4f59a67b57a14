package graft.sources.mqtt

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.{MqttMsg, StatefulCdc}

/** The whole ingest front door end-to-end: a live [[MqttClient]] (over a
  * minimal in-test transport) receives PUBLISHes, its sink feeds the
  * [[MqttBroker]] buffer, the DSv2 source drains the buffer in micro-batches,
  * and the stateful CDC keeps exactly the trigger-passing rows — the
  * reference's callback -> trigger cascade as one wired path.
  */
class ClientEngineSpec extends SparkSpec {
  import spark.implicits._

  /** Transport that connects instantly and delivers a queued script of
    * PUBLISHes, one per loop() pump.
    */
  private final class QueueTransport(script: Seq[(String, String)])
      extends MqttTransport {
    private var listener: MqttTransport.Listener = _
    private var remaining = script
    val subscribed = ArrayBuffer.empty[String]
    override def connect(endpoint: MqttConfig.Endpoint, clientId: String,
        cleanSession: Boolean, keepaliveSec: Int, tls: Option[TlsOptions],
        l: MqttTransport.Listener): Unit = {
      listener = l
      l.onConnack(MqttTransport.ConnackAccepted)
    }
    override def subscribe(topicFilter: String, qos: Int): Unit =
      subscribed += topicFilter
    override def loop(): Int = {
      remaining match {
        case (topic, payload) +: rest =>
          remaining = rest
          listener.onMessage(topic, payload.getBytes("UTF-8"), 0, retain = false)
          MqttTransport.ErrSuccess
        case _ => MqttTransport.ErrNoConn // script drained: end the loop
      }
    }
    override def reconnect(): Unit = ()
    override def disconnect(): Unit = ()
  }

  test("client -> broker buffer -> DSv2 micro-batches -> stateful CDC") {
    val broker = s"client_e2e_${System.nanoTime()}"
    val name = "client_e2e_cdc"
    try {
      // same payload twice on dev1 (CDC must drop the repeat), an excluded
      // topic (client-side drop), and a change on dev2
      val transport = new QueueTransport(Seq(
        "tele/dev1/SENSOR" -> "a",
        "tele/skip/SENSOR" -> "x",
        "tele/dev1/SENSOR" -> "a",
        "tele/dev2/SENSOR" -> "b",
        "tele/dev1/SENSOR" -> "c"))
      val client = MqttClient.forBroker(broker, transport,
        MqttClient.Options(
          MqttConfig.resolve(url = Some("mqtt://localhost/tele/#")),
          subscriptions = Seq("tele/#"),
          excludeTopics = Set("tele/skip/SENSOR"),
          clientId = "e2e"))
      client.connectWithRetry()
      assert(client.isConnected && transport.subscribed.toSeq == Seq("tele/#"))
      assert(client.loopForever() == MqttClient.ExitMqttConnectionError) // script drained
      assert(MqttBroker.size(broker) == 4L) // excluded topic never buffered

      val q = StatefulCdc.changes(
        spark.readStream.format("graft.sources.mqtt.MqttSourceProvider")
          .option("broker", broker)
          .option("maxOffsetsPerTrigger", "2") // force multiple micro-batches
          .load().as[MqttMsg])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val kept = spark.table(name)
        .select($"topic", $"value".cast("string"))
        .as[(String, String)].collect().sorted.toSeq
      // dup "a" dropped across batch boundaries; everything else kept
      assert(kept == Seq(
        "tele/dev1/SENSOR" -> "a",
        "tele/dev1/SENSOR" -> "c",
        "tele/dev2/SENSOR" -> "b"))
    } finally {
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      MqttBroker.clear(broker)
    }
  }
}
