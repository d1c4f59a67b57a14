package graft.sources.mqtt

import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.scalatest.funsuite.AnyFunSuite

/** Live-network certification: the [[MqttClient]] reference state machine
  * driven over REAL loopback TCP sockets through [[SocketMqttTransport]]
  * against [[MiniMqttServer]] — connect/CONNACK, subscribe-on-CONNACK with
  * wildcard filters, exclude-topic drop, credential rejection, dial-refused
  * retry exhaustion, CONN_LOST reconnect with resubscription, and graceful
  * shutdown. No Spark session involved: this is the wire layer under the
  * DSv2 source's ingest seam.
  */
class SocketTransportSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def endpoint(server: MiniMqttServer,
      user: Option[String] = None, pass: Option[String] = None) =
    MqttConfig.Endpoint("mqtt", server.host, server.port, user, pass, None, tls = false)

  private def opts(server: MiniMqttServer, subs: Seq[String],
      exclude: Set[String] = Set.empty, retries: Int = 2) =
    MqttClient.Options(endpoint(server), subs, excludeTopics = exclude,
      connectTimeoutMs = 2000, connectionRetries = retries,
      retryStartDelayMs = 1L)

  /** Poll `cond` for up to `ms`; the loopback round trip is microseconds,
    * the budget is only for scheduler jitter.
    */
  private def eventually(ms: Long = 5000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(10)
    cond
  }

  test("connect, subscribe-on-CONNACK, wildcard delivery, exclude drop over real sockets") {
    val server = new MiniMqttServer()
    val received = new ConcurrentLinkedQueue[(String, String)]()
    try {
      val transport = new SocketMqttTransport()
      val client = new MqttClient(transport, opts(server,
        subs = Seq("tele/+/SENSOR"), exclude = Set("tele/dropme/SENSOR")),
        (topic, payload, _, _) => received.add((topic, new String(payload, StandardCharsets.UTF_8))))
      assert(client.connectOnce().isEmpty, "CONNACK did not arrive")
      assert(client.isConnected)
      assert(eventually()(server.subscriptionCount == 1), "SUBSCRIBE not registered")
      server.publish("tele/devA/SENSOR", bytes("a=1"))
      server.publish("tele/dropme/SENSOR", bytes("excluded"))
      server.publish("other/topic", bytes("unmatched"))
      server.publish("tele/devB/SENSOR", bytes("b=2"))
      assert(eventually()(received.size == 2), s"got ${received.size} messages")
      val got = received.toArray(Array.empty[(String, String)]).toSet
      assert(got == Set(("tele/devA/SENSOR", "a=1"), ("tele/devB/SENSOR", "b=2")))
      transport.disconnect()
      assert(eventually()(server.disconnectCount == 1L), "orderly DISCONNECT not observed")
    } finally server.close()
  }

  test("bad credentials surface the CONNACK return code, not a timeout") {
    val server = new MiniMqttServer(credentials = Some(("user", "secret")))
    try {
      val transport = new SocketMqttTransport()
      val client = new MqttClient(transport,
        opts(server, subs = Seq("#")).copy(
          endpoint = endpoint(server, Some("user"), Some("wrong"))),
        (_, _, _, _) => ())
      assert(client.connectOnce().contains(MqttTransport.ConnackBadCredentials))
      // and the right password connects
      val transport2 = new SocketMqttTransport()
      val client2 = new MqttClient(transport2,
        opts(server, subs = Seq("#")).copy(
          endpoint = endpoint(server, Some("user"), Some("secret"))),
        (_, _, _, _) => ())
      assert(client2.connectOnce().isEmpty)
      transport2.disconnect()
    } finally server.close()
  }

  test("refused dial exhausts the linear retry policy with the reference's give-up error") {
    // bind-then-close: the port is real but nothing listens on it
    val probe = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val deadPort = probe.getLocalPort
    probe.close()
    val ep = MqttConfig.Endpoint("mqtt", "127.0.0.1", deadPort, None, None, None, tls = false)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val client = new MqttClient(new SocketMqttTransport(connectTimeoutMs = 200),
      MqttClient.Options(ep, Seq("#"), connectionRetries = 3, retryStartDelayMs = 7L),
      (_, _, _, _) => (), sleeper = ms => sleeps += ms)
    val e = intercept[MqttClient.ConnectFailedException](client.connectWithRetry())
    assert(e.returnCode == MqttClient.RcDialFailed)
    // linear, not doubling: 7, 14 between the three attempts
    assert(sleeps.filter(_ >= 7L) == Seq(7L, 14L), sleeps.toString)
  }

  test("CONN_LOST reconnects, resubscribes, and keeps receiving (loop_forever parity)") {
    val server = new MiniMqttServer()
    val received = new ConcurrentLinkedQueue[String]()
    try {
      val transport = new SocketMqttTransport()
      val client = new MqttClient(transport, opts(server, subs = Seq("tele/#")),
        (_, payload, _, _) => received.add(new String(payload, StandardCharsets.UTF_8)))
      assert(client.connectOnce().isEmpty)
      assert(eventually()(server.subscriptionCount == 1))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val done = new CountDownLatch(1)
      var exit = -1
      val pump = new Thread(() => { exit = client.loopForever(() => stop.get()); done.countDown() })
      pump.setDaemon(true)
      pump.start()
      server.publish("tele/a", bytes("before"))
      assert(eventually()(received.contains("before")))
      // hard-drop: no DISCONNECT — the client must see CONN_LOST, re-dial,
      // and resubscribe from its onConnack (clean session loses the subs)
      server.dropAllClients()
      assert(eventually()(server.subscriptionCount == 1), "did not resubscribe after reconnect")
      // probe-publish until delivery: QoS-0 at-most-once means a publish
      // racing the SUBSCRIBE is legitimately lost, so one-shot sends can
      // fail under scheduler load even after the reconnect succeeds
      assert(eventually() {
        server.publish("tele/a", bytes("after")); received.contains("after")
      }, "no delivery after reconnect")
      stop.set(true)
      done.await()
      assert(exit == MqttClient.ExitOk)
      assert(eventually()(server.disconnectCount == 1L), "graceful stop did not DISCONNECT")
    } finally server.close()
  }
}
