package graft.sources.mqtt

import java.net.URI

/** MQTT connection-config resolution (SURVEY §2.1 S2), matching the
  * reference's `get_mqtt_parts` semantics
  * (/root/reference/mqtt2sql.py:679-726, defaults :95-131):
  *
  *  - a `mqtt(s)://user:pass@host:port/topic` URL is parsed into parts which
  *    pass through LITERALLY: the reference quotes the whole URL before
  *    urlparse and unquotes each part after — a net identity, so `%2B` stays
  *    `%2B` and `+` stays `+` (an MQTT wildcard). We therefore read the RAW
  *    (undecoded) URI components;
  *  - precedence per part: explicit option > URL part > default;
  *  - the URL path (sans leading '/') is the subscription topic;
  *  - TLS is scheme-inferred (`mqtts`), and a scheme is upgraded to `mqtts`
  *    when TLS material (cafile/certfile/keyfile) is configured without an
  *    explicit scheme (mqtt2sql.py:700-703);
  *  - default port follows the resolved scheme: 1883 plain, 8883 TLS
  *    (mqtt2sql.py:128-130 DEFAULT_PORT_*).
  *
  * Pure config plumbing — feeds the options of
  * [[MqttSourceProvider]] (`broker` naming / future live client), no engine
  * work.
  */
object MqttConfig {

  final case class Endpoint(scheme: String, host: String, port: Int,
      username: Option[String], password: Option[String],
      topic: Option[String], tls: Boolean)

  val DefaultUrl = "mqtt://localhost/#"
  val DefaultHost = "localhost"
  val DefaultPortMqtt = 1883
  val DefaultPortMqtts = 8883

  def resolve(url: Option[String] = Some(DefaultUrl),
      host: Option[String] = None, port: Option[Int] = None,
      username: Option[String] = None, password: Option[String] = None,
      topic: Option[String] = None, hasTlsMaterial: Boolean = false): Endpoint = {
    // URL parts fill only what explicit options left unset (flag > URL > default)
    val parsed = url.flatMap { u =>
      try {
        val uri = new URI(u)
        if (uri.getAuthority == null) None else Some(uri)
      } catch { case _: Exception => None }
    }
    val urlScheme = parsed.flatMap(u => Option(u.getScheme))
    // RAW components: java.net.URI's cooked accessors percent-decode, which
    // the reference never does (quote-then-unquote is a net identity)
    val userInfo = parsed.flatMap(u => Option(u.getRawUserInfo)).map(_.split(":", 2))
    val scheme = urlScheme.getOrElse(if (hasTlsMaterial) "mqtts" else "mqtt")
    val resolvedHost = host
      .orElse(parsed.flatMap(u => Option(u.getHost)))
      .getOrElse(DefaultHost)
    val resolvedPort = port
      .orElse(parsed.map(_.getPort).filter(_ > 0))
      .getOrElse(if (scheme.endsWith("s")) DefaultPortMqtts else DefaultPortMqtt)
    val resolvedTopic = topic.orElse(
      parsed.flatMap(u => Option(u.getRawPath)).filter(_.nonEmpty)
        .map(_.stripPrefix("/")).filter(_.nonEmpty))
    val resolvedUser = username.orElse(userInfo.map(_(0)))
    val resolvedPass = password.orElse(userInfo.filter(_.length > 1).map(_(1)))
    Endpoint(scheme, resolvedHost, resolvedPort, resolvedUser, resolvedPass,
      resolvedTopic, scheme.endsWith("s"))
  }
}
