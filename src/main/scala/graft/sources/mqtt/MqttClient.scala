package graft.sources.mqtt

import scala.util.control.NonFatal

/** The live MQTT client state machine (SURVEY §2.1 S1) — the reference's
  * ingest front door, driven against the [[MqttTransport]] network seam.
  *
  * Reference parity, piece by piece:
  *
  *  - '''connect''' (`mqtt_connect`, mqtt2sql.py:843-897): build the client
  *    with a `name-pid` client id and clean session, install callbacks, plumb
  *    TLS material and username/password, dial, then poll for CONNACK;
  *  - '''CONNACK wait''' (`wait_for_connect`, mqtt2sql.py:728-735): poll the
  *    connected flag every `pollIntervalMs` (10 ms) for
  *    `connectTimeoutMs / pollIntervalMs` iterations — default timeout 500 ms
  *    (DEFAULTS\['mqtt-connect-timeout'\], mqtt2sql.py:111);
  *  - '''subscribe-on-CONNACK''' (`on_connect`, mqtt2sql.py:737-760): a
  *    successful CONNACK subscribes every configured topic filter at QoS 0
  *    from inside the callback, before the main loop starts;
  *  - '''message dispatch''' (`on_message`, mqtt2sql.py:762-787): exact
  *    exclude-topic membership drops first, then the message is handed to the
  *    sink (here: [[MqttBroker.publish]], feeding the DSv2 micro-batch
  *    source, where the reference spawns a write2sql thread);
  *  - '''connect retry''' ([[LinearRetry]]): the reference's
  *    connection-retry loop (mqtt2sql.py:523-566) — N attempts, delay starts
  *    at the base and GROWS BY THE BASE each failure (`delay += base`:
  *    linear, though the option help text claims doubling, mqtt2sql.py:446);
  *    exhaustion exits with an error status (mqtt2sql.py:563-566);
  *  - '''main loop''' (`loop_forever`, mqtt2sql.py:899-924): pump the
  *    transport until an error; CONN_LOST reconnects and carries on, a failed
  *    reconnect or any other error exits with MQTT_CONNECTION_ERROR (=2,
  *    mqtt2sql.py:42).
  *
  * Time is injected (`sleeper`) so specs drive the 500 ms/10 ms contract on a
  * virtual clock with zero wall-clock sleeps.
  */
object MqttClient {

  /** Reference exit statuses (mqtt2sql.py:40-44). */
  val ExitOk = 0
  val ExitMqttConnectionError = 2

  /** Connect attempt refused before CONNACK polling could start (network
    * refusal — the reference returns `(None, MQTT_CONNECTION_ERROR)`,
    * mqtt2sql.py:888-890). Distinct from a CONNACK return code.
    */
  val RcDialFailed: Int = -1

  final case class Options(
      endpoint: MqttConfig.Endpoint,
      subscriptions: Seq[String],
      excludeTopics: Set[String] = Set.empty,
      clientId: String = s"graft-${ProcessHandle.current().pid()}",
      keepaliveSec: Int = 60, // DEFAULTS['mqtt-keepalive'], mqtt2sql.py:110
      connectTimeoutMs: Int = 500, // DEFAULTS['mqtt-connect-timeout'], :111
      pollIntervalMs: Int = 10, // wait_for_connect's 0.01 s, :731
      connectionRetries: Int = 10, // DEFAULTS['*-connection-retry'], :121
      retryStartDelayMs: Long = 1000, // '*-retry-start-delay' (1 s), :122
      tls: Option[TlsOptions] = None)

  /** Client whose received messages feed the [[MqttBroker]] buffer `broker`
    * consumes — composing the live front door with the DSv2 source:
    * transport -> client -> broker buffer -> micro-batches.
    */
  def forBroker(broker: String, transport: MqttTransport, opts: Options,
      sleeper: Long => Unit = Thread.sleep): MqttClient =
    new MqttClient(transport, opts,
      (topic, payload, qos, retain) => MqttBroker.publish(broker, topic, payload, qos, retain),
      sleeper)

  final class ConnectFailedException(val returnCode: Int, msg: String)
      extends RuntimeException(msg)
}

final class MqttClient(
    transport: MqttTransport,
    opts: MqttClient.Options,
    sink: (String, Array[Byte], Int, Boolean) => Unit,
    sleeper: Long => Unit = Thread.sleep,
    log: String => Unit = _ => ()) {

  import MqttClient._
  import MqttTransport._

  @volatile private var connected = false
  @volatile private var connectRc = ConnackAccepted

  private[mqtt] val listener: Listener = new Listener {
    // on_connect (mqtt2sql.py:737-760): record the rc, and on success
    // subscribe every configured filter at QoS 0 before returning
    override def onConnack(returnCode: Int): Unit = {
      connectRc = returnCode
      connected = returnCode == ConnackAccepted
      if (connected) opts.subscriptions.foreach(t => transport.subscribe(t, 0))
    }

    // on_message (mqtt2sql.py:780-787): exclude-list is EXACT membership
    // (wildcards live only in subscriptions), then hand off to the sink
    override def onMessage(topic: String, payload: Array[Byte], qos: Int,
        retain: Boolean): Unit =
      if (!opts.excludeTopics.contains(topic)) sink(topic, payload, qos, retain)
  }

  def isConnected: Boolean = connected

  /** wait_for_connect (mqtt2sql.py:728-735): poll every `pollIntervalMs`, at
    * most `connectTimeoutMs / pollIntervalMs` times. Mirrors the reference's
    * `return 0 != timeout` exactly: success requires CONNACK to land with
    * iterations to spare.
    */
  private def waitForConnect(): Boolean = {
    var remaining = opts.connectTimeoutMs / opts.pollIntervalMs
    while (!connected && remaining > 0) {
      sleeper(opts.pollIntervalMs.toLong)
      remaining -= 1
    }
    remaining != 0
  }

  /** One connect attempt (`mqtt_connect`, mqtt2sql.py:843-897): dial, then
    * poll for CONNACK. Returns the failing return code, or None on success.
    * TLS is engaged when material is configured OR the endpoint's scheme
    * demands it (mqtt2sql.py:700-703 upgrades the scheme on TLS material;
    * the endpoint arrives here already resolved by [[MqttConfig.resolve]]).
    */
  def connectOnce(): Option[Int] = {
    connected = false
    connectRc = ConnackAccepted
    // TLS engages when material is configured OR the scheme demands it; a
    // user-supplied options object is passed through whole in either case
    // (an insecure-only TlsOptions on an mqtts endpoint must keep its
    // insecure flag — reference: tls_insecure_set, mqtt2sql.py:875)
    val tls = opts.tls match {
      case Some(t) if t.defined || opts.endpoint.tls => Some(t)
      case Some(_) => None // options without material on a plain scheme: no TLS
      case None => if (opts.endpoint.tls) Some(TlsOptions()) else None
    }
    try transport.connect(opts.endpoint, opts.clientId, cleanSession = true,
      opts.keepaliveSec, tls, listener)
    catch {
      case NonFatal(e) =>
        log(s"MQTT connect failed: ${e.getMessage}")
        return Some(RcDialFailed)
    }
    if (waitForConnect()) None else Some(connectRc)
  }

  /** Connect under the reference's connection-retry policy
    * (mqtt2sql.py:523-566): up to `connectionRetries` attempts, sleeping
    * `base, 2*base, 3*base, ...` between them (linear `delay += base`,
    * mqtt2sql.py:561-562). Exhaustion throws [[MqttClient.ConnectFailedException]]
    * — the analog of the reference's give-up exit (mqtt2sql.py:563-566).
    */
  def connectWithRetry(): Unit = {
    val result = LinearRetry(opts.connectionRetries, opts.retryStartDelayMs, sleeper) {
      connectOnce()
    }
    result.foreach { rc =>
      throw new ConnectFailedException(rc,
        s"MQTT connection ERROR: rc=$rc after ${opts.connectionRetries} attempts - give up")
    }
  }

  /** loop_forever (mqtt2sql.py:899-924): pump the transport until an error;
    * CONN_LOST reconnects in place and resumes, a failed reconnect or any
    * other status exits with [[MqttClient.ExitMqttConnectionError]]. A
    * transport exception inside loop() is logged and retried after 100 ms
    * (mqtt2sql.py:908-912). `shouldStop` is the graceful-shutdown seam
    * (the reference's signal handler, mqtt2sql.py:913-914).
    */
  def loopForever(shouldStop: () => Boolean = () => false): Int = {
    while (!shouldStop()) {
      var ret = ErrSuccess
      while (ret == ErrSuccess && !shouldStop()) {
        try ret = transport.loop()
        catch {
          case NonFatal(e) =>
            log(s"ERROR: loop() - ${e.getMessage}")
            sleeper(100L)
        }
      }
      if (!shouldStop()) {
        if (ret == ErrConnLost) {
          log("Remote disconnected from MQTT - reconnecting")
          try { transport.reconnect(); log("MQTT reconnected") }
          catch {
            case NonFatal(e) =>
              log(s"reconnect failed - ${e.getMessage}")
              return ExitMqttConnectionError
          }
        } else {
          log(s"MQTT loop failed with rc=$ret")
          return ExitMqttConnectionError
        }
      }
    }
    transport.disconnect()
    ExitOk
  }
}

/** The reference's connection-retry shape (mqtt2sql.py:523-566), extracted:
  * run `attempt` up to `retries` times; between failures sleep a delay that
  * starts at `startDelayMs` and grows by the same base each time
  * (`delay += base` — linear, not doubled, whatever the help text says,
  * mqtt2sql.py:446 vs :561-562). Returns None on success, or the last
  * failure after exhaustion.
  */
object LinearRetry {
  def apply[E](retries: Int, startDelayMs: Long, sleeper: Long => Unit)(
      attempt: => Option[E]): Option[E] = {
    // retries <= 0 must not read as success-without-attempting (the caller
    // would proceed on a transport that never dialed)
    require(retries >= 1, s"retries must be >= 1, got $retries")
    var remaining = retries
    var delay = startDelayMs
    var last: Option[E] = None
    while (remaining > 0) {
      attempt match {
        case None => return None
        case failure =>
          last = failure
          remaining -= 1
          if (remaining > 0) {
            sleeper(delay)
            delay += startDelayMs
          }
      }
    }
    last
  }
}
