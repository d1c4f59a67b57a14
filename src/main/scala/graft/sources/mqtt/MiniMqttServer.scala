package graft.sources.mqtt

import java.io.BufferedInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import graft.functions.MqttTopicMatches

/** Minimal loopback MQTT 3.1.1 broker — the live-network certification
  * peer for [[SocketMqttTransport]]. The reference assumes a
  * mosquitto-style broker on the other end of the socket
  * (/root/reference/mqtt2sql.py:843-897); in a zero-egress build the
  * broker has to live in-process, but the CONVERSATION is the real wire
  * protocol over real TCP sockets: CONNECT/CONNACK (with optional
  * credential checking -> rc 4, §3.2.2.3), SUBSCRIBE/SUBACK with full
  * `+`/`#` filter matching ([[MqttTopicMatches.matches]] — the same matcher the
  * Catalyst expression compiles), QoS-0 PUBLISH routing between clients
  * and from the server-side [[publish]] API, PINGREQ/PINGRESP, and orderly
  * DISCONNECT. Per the spec, live forwards clear the RETAIN flag
  * (§3.3.1.3); retained-message storage is not implemented (the reference
  * pipeline never relies on it).
  *
  * Test seams: [[dropAllClients]] hard-closes sockets without DISCONNECT
  * (the CONN_LOST the reference's loop reconnects from,
  * mqtt2sql.py:915-923), [[subscriptionCount]] observes resubscription
  * after reconnect, [[disconnectCount]] observes graceful shutdowns.
  */
final class MiniMqttServer(credentials: Option[(String, String)] = None) {

  import MqttCodec._

  private val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  private val clients = ConcurrentHashMap.newKeySet[ClientConn]()
  @volatile private var closed = false
  private val disconnects = new AtomicLong(0L)

  /** Ephemeral port — endpoint host is always the loopback address. */
  def port: Int = server.getLocalPort
  def host: String = server.getInetAddress.getHostAddress

  private final class ClientConn(val socket: Socket) {
    val out = socket.getOutputStream
    @volatile var filters: Set[String] = Set.empty
    def deliver(topic: String, payload: Array[Byte]): Unit =
      if (filters.exists(f => MqttTopicMatches.matches(topic, f)))
        try out.synchronized {
          writePacket(out, PUBLISH, 0, publishBody(topic, payload))
        } catch { case NonFatal(_) => () } // dead subscriber; reaped by its handler
  }

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "graft-mini-mqtt-handler")
        t.setDaemon(true)
        t.start()
      } catch { case NonFatal(_) => () } // closed during accept
    }
  }, "graft-mini-mqtt-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val conn = new ClientConn(sock)
    try {
      val in = new BufferedInputStream(sock.getInputStream)
      val first = readPacket(in)
      if (first.ptype != CONNECT) { sock.close(); return }
      val info = parseConnect(first.body)
      val rc = credentials match {
        case Some((u, p)) if !(info.username.contains(u) && info.password.contains(p)) =>
          MqttTransport.ConnackBadCredentials
        case _ => MqttTransport.ConnackAccepted
      }
      conn.out.synchronized {
        writePacket(conn.out, CONNACK, 0, connackBody(sessionPresent = false, rc))
      }
      if (rc != MqttTransport.ConnackAccepted) { sock.close(); return }
      clients.add(conn)
      var live = true
      while (live && !closed) {
        val p = readPacket(in)
        p.ptype match {
          case SUBSCRIBE =>
            val sub = parseSubscribe(p.body)
            conn.filters ++= sub.filters.map(_._1)
            // QoS-0 broker: every grant is 0 regardless of the request
            conn.out.synchronized {
              writePacket(conn.out, SUBACK, 0, subackBody(sub.packetId, 0))
            }
          case PUBLISH =>
            val pub = parsePublish(p.flags, p.body)
            route(pub.topic, pub.payload)
          case PINGREQ =>
            conn.out.synchronized {
              writePacket(conn.out, PINGRESP, 0, Array.emptyByteArray)
            }
          case DISCONNECT =>
            disconnects.incrementAndGet()
            live = false
          case _ => ()
        }
      }
    } catch {
      case NonFatal(_) => () // EOF / reset: the client is gone either way
    } finally {
      clients.remove(conn)
      try sock.close() catch { case NonFatal(_) => () }
    }
  }

  private def route(topic: String, payload: Array[Byte]): Unit =
    clients.iterator().asScala.foreach(_.deliver(topic, payload))

  /** Server-side publish — the firehose the certification tests feed. */
  def publish(topic: String, payload: Array[Byte]): Unit = route(topic, payload)

  /** Connected clients currently holding at least one subscription. */
  def subscriptionCount: Int =
    clients.iterator().asScala.count(_.filters.nonEmpty)

  def clientCount: Int = clients.size()

  /** Orderly DISCONNECTs observed (graceful-shutdown evidence). */
  def disconnectCount: Long = disconnects.get()

  /** Hard-drop every client socket with no DISCONNECT — the broker-side
    * failure the client's loop must surface as CONN_LOST and reconnect from.
    * Dropped connections leave the routing/observation sets IMMEDIATELY
    * (their handler threads remove them again, idempotently): observers
    * polling [[subscriptionCount]] for the reconnect must never count a
    * corpse whose handler hasn't noticed the close yet.
    */
  def dropAllClients(): Unit =
    clients.iterator().asScala.foreach { c =>
      try c.socket.close() catch { case NonFatal(_) => () }
      clients.remove(c)
    }

  def close(): Unit = {
    closed = true
    dropAllClients()
    try server.close() catch { case NonFatal(_) => () }
  }
}
