package graft.sources.mqtt

/** The network seam of the live MQTT client (SURVEY §2.1 S1 front door).
  *
  * This is the paho-client-shaped boundary: [[MqttClient]] drives the
  * reference's connect / CONNACK-wait / subscribe / loop state machine
  * (/root/reference/mqtt2sql.py:843-897, :899-924) against this trait, and
  * tests substitute a scripted fake. [[SocketMqttTransport]] backs it with
  * the real MQTT 3.1.1 codec ([[MqttCodec]]) over real TCP/TLS sockets,
  * certified end-to-end against the in-process [[MiniMqttServer]] broker on
  * loopback (SocketTransportSpec / LiveIngestSpec); everything above this
  * line — timeout polling, retry policy, subscribe-on-CONNACK,
  * reconnect-on-conn-lost, exclude-topic drop — is the reference-parity
  * logic under test, identical for both backends.
  */
trait MqttTransport {

  /** Open the session and send CONNECT (TCP/TLS dial + MQTT CONNECT packet,
    * mqtt2sql.py:887 `mqttc.connect(host, port, keepalive)`). The broker's
    * CONNACK arrives asynchronously through `listener.onConnack` while the
    * client polls its connected flag (mqtt2sql.py:728-735). Throws on
    * immediate network refusal (DNS/TCP errors — mqtt2sql.py:888-890).
    */
  def connect(endpoint: MqttConfig.Endpoint, clientId: String,
      cleanSession: Boolean, keepaliveSec: Int, tls: Option[TlsOptions],
      listener: MqttTransport.Listener): Unit

  /** SUBSCRIBE to one topic filter (mqtt2sql.py:755-760 `client.subscribe`). */
  def subscribe(topicFilter: String, qos: Int): Unit

  /** Process pending network traffic once; returns a paho-style status code
    * ([[MqttTransport.ErrSuccess]] while healthy, [[MqttTransport.ErrConnLost]]
    * on a dropped connection, anything else is fatal) — mqtt2sql.py:908
    * `self.mqttc.loop()`.
    */
  def loop(): Int

  /** Re-dial the last endpoint after CONN_LOST (mqtt2sql.py:919
    * `self.mqttc.reconnect()`); throws when the broker is unreachable.
    */
  def reconnect(): Unit

  /** Orderly DISCONNECT + socket close. */
  def disconnect(): Unit
}

object MqttTransport {
  // paho-mqtt numeric error codes (public constants of the reference's
  // client library; only these three drive control flow in mqtt2sql.py)
  val ErrSuccess = 0
  val ErrNoConn = 4
  val ErrConnLost = 7

  // CONNACK return codes (MQTT 3.1 spec §3.2.2.3); 0 accepts, the rest are
  // what on_connect surfaces as `return_code` (mqtt2sql.py:744-747)
  val ConnackAccepted = 0
  val ConnackBadCredentials = 4
  val ConnackNotAuthorized = 5

  /** Asynchronous broker->client events, the callback half of the paho API
    * surface the reference installs (mqtt2sql.py:877-880).
    */
  trait Listener {
    /** Broker answered CONNECT (on_connect, mqtt2sql.py:737-760). */
    def onConnack(returnCode: Int): Unit

    /** PUBLISH received on a subscribed filter (on_message,
      * mqtt2sql.py:762-787).
      */
    def onMessage(topic: String, payload: Array[Byte], qos: Int,
        retain: Boolean): Unit
  }
}

/** TLS material, mirroring the reference's option set: any of
  * cafile/certfile/keyfile turns TLS on with required cert verification, and
  * `insecure` suppresses hostname verification (mqtt2sql.py:870-875
  * `tls_set(..., cert_reqs=ssl.CERT_REQUIRED)` / `tls_insecure_set`).
  */
final case class TlsOptions(cafile: Option[String] = None,
    certfile: Option[String] = None, keyfile: Option[String] = None,
    insecure: Boolean = false) {
  def defined: Boolean = cafile.isDefined || certfile.isDefined || keyfile.isDefined
}
