package graft.operators

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Property tests (SURVEY §5.2c) against an INDEPENDENT in-memory reference
  * model of the trigger semantics (/root/reference/mysql.sql:67-91): a plain
  * Scala fold over messages in arrival order, written from the DDL spec —
  * not from our Spark code — so agreement is evidence, not tautology.
  * Deterministic seeded generation (40 random cases across the properties);
  * shrinkage is unnecessary because any failing case prints its seed row set.
  */
class MqttPropertiesSpec extends SparkSpec {
  import spark.implicits._

  case class M(msgId: Long, t: Long, topic: String, v: String)

  /** Random message sequence: small topic/payload pools force collisions,
    * duplicate timestamps force tiebreak handling.
    */
  private def genMsgs(rnd: Random, n: Int): Seq[M] =
    (1 to n).map { i =>
      M(i.toLong, 100 + rnd.nextInt(20), s"top/${rnd.nextInt(5)}", s"p${rnd.nextInt(3)}")
    }

  private def df(msgs: Seq[M]): DataFrame =
    msgs.map(m => (m.msgId, new Timestamp(m.t * 1000L), m.topic,
        m.v.getBytes("UTF-8"), 0, 0))
      .toDF("msg_id", "ts", "topic", "value", "qos", "retain")

  /** Arrival order: (ts, msg_id) — the README.md:251 disambiguation. */
  private def arrival(msgs: Seq[M]): Seq[M] = msgs.sortBy(m => (m.t, m.msgId))

  // --- the reference model (from the DDL, not from MqttPipeline) -----------

  /** mqtt table: last arrival per topic (PK-upsert, mysql.sql:51). */
  private def modelState(msgs: Seq[M]): Map[String, M] =
    arrival(msgs).foldLeft(Map.empty[String, M])((s, m) => s + (m.topic -> m))

  /** mqtt_history: first insert iff enable; update iff enable AND
    * (diffonly=0 OR value changed) (mysql.sql:78-91).
    */
  private def modelHistory(msgs: Seq[M],
      flags: Map[String, (Int, Int)]): Seq[M] = {
    var last = Map.empty[String, String]
    val out = Seq.newBuilder[M]
    arrival(msgs).foreach { m =>
      val (enable, diffonly) = flags.getOrElse(m.topic, (1, 1))
      val keep = last.get(m.topic) match {
        case None => enable == 1
        case Some(prev) => enable == 1 && (diffonly == 0 || prev != m.v)
      }
      if (keep) out += m
      last += (m.topic -> m.v)
    }
    out.result()
  }

  test("property: state table is exactly the model's last-arrival-per-topic, ids contiguous") {
    val rnd = new Random(7)
    for (k <- 1 to 10) {
      val msgs = genMsgs(rnd, 30 + k)
      val got = MqttPipeline.stateTable(df(msgs))
        .select($"id", $"topic", $"value".cast("string"))
        .as[(Long, String, String)].collect().toSeq
      val model = modelState(msgs)
      assert(got.map(_._2).toSet == model.keySet, s"case $k: $msgs")
      assert(got.map(r => r._2 -> r._3).toMap ==
        model.map { case (t, m) => t -> m.v }, s"case $k: $msgs")
      // ids are 1..K with no gaps, in first-arrival order
      val sortedIds = got.map(_._1).sorted
      assert(sortedIds == (1L to model.size.toLong), s"case $k: $msgs")
      // state ids follow first-PUBLISH order (msg_id = the commit-sequence
      // stand-in), the reference's insert-order autoincrement — distinct from
      // history's read-side (ts, id) order
      val firstPublish = msgs.sortBy(_.msgId).map(_.topic).distinct
      assert(got.sortBy(_._1).map(_._2) == firstPublish, s"case $k: $msgs")
    }
  }

  test("property: history equals the model for random flag matrices") {
    val rnd = new Random(13)
    for (k <- 1 to 10) {
      val msgs = genMsgs(rnd, 40)
      val flags = (0 until 5).map(i =>
        s"top/$i" -> (rnd.nextInt(2), rnd.nextInt(2))).toMap
      val flagsDf = flags.toSeq.map { case (t, (e, d)) => (t, e, d) }
        .toDF("topic", "history_enable", "history_diffonly")
      val got = MqttPipeline.history(df(msgs), Some(flagsDf))
        .select($"msg_id").as[Long].collect().toSet
      val want = modelHistory(msgs, flags).map(_.msgId).toSet
      assert(got == want, s"case $k flags=$flags: $msgs")
    }
  }

  test("property: history with default flags is the change-compressed sequence") {
    val rnd = new Random(29)
    for (k <- 1 to 10) {
      val msgs = genMsgs(rnd, 25)
      val got = MqttPipeline.history(df(msgs)).select($"msg_id").as[Long].collect().toSet
      val want = modelHistory(msgs, Map.empty).map(_.msgId).toSet
      assert(got == want, s"case $k: $msgs")
    }
  }

  test("property: view join is total (one row per history row) with state ts_last") {
    val rnd = new Random(41)
    for (k <- 1 to 10) {
      val msgs = genMsgs(rnd, 30)
      val m = df(msgs)
      val h = MqttPipeline.history(m)
      val v = MqttPipeline.historyView(h, MqttPipeline.stateTable(m))
      assert(v.count() == h.count(), s"case $k: $msgs")
      val model = modelState(msgs)
      val tsLast = v.select($"topic", $"ts_last").distinct()
        .as[(String, Timestamp)].collect().toMap
      assert(tsLast.map { case (t, ts) => t -> (ts.getTime / 1000L) } ==
        model.map { case (t, mm) => t -> mm.t }, s"case $k: $msgs")
    }
  }
}
