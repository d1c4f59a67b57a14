package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole data-processing surface, re-expressed as declarative
  * Spark transforms over a message frame `(msg_id, ts, topic, value, qos, retain)`.
  *
  * Reference semantics being reproduced (file:line into /root/reference/):
  *  - exclude-topic filter: exact string membership, NOT pattern matching
  *    (mqtt2sql.py:782-783)
  *  - `mqtt` state table: one row per topic = last committed message, PK topic
  *    (mysql.sql:51; upsert at mqtt2sql.py:579-629), contiguous ids forced by
  *    the before-insert trigger (mysql.sql:67-74)
  *  - `mqtt_history` append log: AFTER INSERT always appends; AFTER UPDATE
  *    appends only when `history_enable=1` AND (`history_diffonly=0` OR the
  *    payload changed) (mysql.sql:78-91, sqlite.sql:58-70)
  *  - `mqtt_history_view`: inner equi-join of history with its topic dimension,
  *    projecting (id, ts, ts_last, topic, value) (mysql.sql:94-103)
  *
  * Scale notes (the part the reference, a single-threaded home-automation
  * bridge, never had to face):
  *  - every per-topic computation partitions by `topic` — on a cluster the one
  *    shuffle co-locates each key's messages, then lag/row_number run
  *    partition-locally with whole-stage codegen;
  *  - the state table is dimension-sized (one row per distinct topic), so the
  *    view join broadcasts it — no shuffle of the (potentially huge) history;
  *  - contiguous id assignment uses [[ContiguousId]] (range-shuffle +
  *    zipWithIndex), never a global single-partition window.
  */
object MqttPipeline {

  /** Message arrival order: the reference disambiguates equal (second
    * granularity) timestamps by ascending autoincrement id (README.md:251);
    * msg_id is our deterministic stand-in for arrival order.
    */
  private def arrival: Seq[Column] = Seq(col("ts"), col("msg_id"))

  /** F2 — exclude-topic anti-filter: exact membership, deliberately NOT
    * wildcard matching (mqtt2sql.py:782-783). Codegen'd `Not(In(...))`.
    */
  def excludeTopics(msgs: DataFrame, exclude: Seq[String]): DataFrame =
    if (exclude.isEmpty) msgs
    else msgs.filter(!col("topic").isin(exclude: _*))

  /** A2 + A1 — the `mqtt` latest-state table: last message per topic with
    * contiguous ids in first-PUBLISH order — min(msg_id), the commit-sequence
    * stand-in — which is the order the reference's max(id)+1 before-insert
    * trigger assigns (ids reflect insert order, not the read-side (ts, id)
    * order history rows use).
    * One aggregation on topic with map-side partial combine: `max_by` over
    * the (ts, msg_id) arrival order picks the latest full row and min(msg_id)
    * the first arrival in the same pass, so each mapper ships ONE candidate
    * row per topic — the shuffle is O(topics × mappers), not O(messages),
    * where the earlier window formulation shuffled every message. At fact
    * scale that is the difference between a dimension-build and a full
    * re-shuffle of the stream.
    */
  def stateTable(msgs: DataFrame): DataFrame = {
    val latest = msgs
      .groupBy(col("topic"))
      .agg(
        max_by(
          struct(col("ts"), col("value"), col("qos"), col("retain")),
          struct(col("ts"), col("msg_id"))).as("last"),
        min(col("msg_id")).as("first_arrival"))
    ContiguousId
      .assign(latest, "id", Seq(col("first_arrival")))
      .select(col("id"), col("last.ts").as("ts"), col("topic"),
        col("last.value").as("value"), col("last.qos").as("qos"),
        col("last.retain").as("retain"))
  }

  /** F3 + F4 + S5 — the `mqtt_history` CDC log, batch-replay form.
    *
    * Trigger semantics per message, in arrival order within each topic:
    *  - the first message of a topic is an INSERT: history row iff enable=1
    *    (mysql.sql:78-83 appends unconditionally on insert BUT only when
    *    `NEW.history_enable=1` — mysql.sql:79);
    *  - subsequent messages are UPDATEs: history row iff enable=1 AND
    *    (diffonly=0 OR value changed vs the previous message) (mysql.sql:86-91).
    *
    * `lag(value) over (partition by topic order by arrival)` is the exact batch
    * equivalent of "compare against the stored previous payload" — the state
    * the triggers read from the `mqtt` row they are about to overwrite.
    * `flags` carries per-topic (history_enable, history_diffonly); the
    * reference defaults both to 1 (mysql.sql:49-50).
    */
  /** The kept (trigger-passing) rows BEFORE id assignment — the sub-step the
    * streaming CDC path shares: [[graft.streaming.StatefulCdc]] produces the
    * same `(ts, topic, value, msg_id)` rows incrementally, and both feed
    * [[history]]'s id assignment through
    * [[MqttQueries.finishHistory]].
    */
  def historyKept(msgs: DataFrame, flags: Option[DataFrame] = None): DataFrame = {
    val withFlags = flags match {
      case Some(f) => msgs.join(broadcast(f), Seq("topic"), "left")
        .na.fill(Map("history_enable" -> 1, "history_diffonly" -> 1))
      case None => msgs
        .withColumn("history_enable", lit(1))
        .withColumn("history_diffonly", lit(1))
    }
    val w = Window.partitionBy(col("topic")).orderBy(arrival: _*)
    withFlags
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("history_enable") === 1 &&
        (col("history_diffonly") === 0 ||
          col("prev_value").isNull ||
          !(col("prev_value") <=> col("value"))))
      .select(col("ts"), col("topic"), col("value"), col("msg_id"))
  }

  def history(msgs: DataFrame, flags: Option[DataFrame] = None): DataFrame =
    // history ids are ascending in arrival order across ALL topics (the
    // autoincrement users sort by, README.md:251)
    ContiguousId.assign(historyKept(msgs, flags), "id", arrival)

  /** J1 + F5 — `mqtt_history_view` (mysql.sql:94-103): resolve each history
    * row's topic to its state-table id and last-receive time. The state side is
    * one row per distinct topic -> broadcast, so the history side never
    * shuffles (BroadcastHashJoin).
    */
  def historyView(history: DataFrame, state: DataFrame): DataFrame = {
    val dim = state.select(col("id").as("topicid"), col("topic"), col("ts").as("ts_last"))
    history.join(broadcast(dim), Seq("topic"), "inner")
      .select(col("id"), col("ts"), col("ts_last"), col("topic"), col("value"))
  }
}
