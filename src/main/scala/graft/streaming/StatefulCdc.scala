package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One MQTT message in the streaming pipeline (the reference's
  * `(topic, payload, qos, retain)` callback payload plus receipt time and a
  * deterministic arrival id — /root/reference/mqtt2sql.py:478-480,522).
  */
case class MqttMsg(msg_id: Long, ts: Timestamp, topic: String,
    value: Array[Byte], qos: Int, retain: Int)

/** A history (CDC) event: the message survived the diff-only gate. */
case class CdcEvent(topic: String, ts: Timestamp, msg_id: Long, value: Array[Byte])

/** Streaming form of the reference's trigger cascade
  * (/root/reference/mysql.sql:78-91): per topic, append a history event for
  * the first message and for every payload CHANGE; suppress unchanged repeats
  * (history_diffonly=1 semantics).
  *
  * State per key is exactly what the DB trigger reads — the last payload —
  * held in `GroupState[Array[Byte]]`. Batch replay of the same input through
  * [[graft.operators.MqttPipeline.history]] (the `lag` window form) yields the
  * same events; `StreamingCdcSpec` asserts that equivalence, the core
  * incremental-equals-batch property (SURVEY §5.2d).
  *
  * Scale: state is one payload per topic; `flatMapGroupsWithState` hash-
  * partitions by topic, so a 1000-executor cluster shards the keyspace with
  * no cross-key coordination.
  */
object StatefulCdc {

  def changes(msgs: Dataset[MqttMsg]): Dataset[CdcEvent] = {
    implicit val stateEnc = Encoders.BINARY
    implicit val outEnc = Encoders.product[CdcEvent]
    msgs
      .groupByKey(_.topic)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(processTopic)
  }

  /** Per-topic, per-micro-batch: order arrivals deterministically (the batch
    * analog of commit order), diff each against the running last payload.
    */
  private def processTopic(topic: String, batch: Iterator[MqttMsg],
      state: GroupState[Array[Byte]]): Iterator[CdcEvent] = {
    var last: Option[Array[Byte]] = state.getOption
    val out = Vector.newBuilder[CdcEvent]
    batch.toSeq.sortBy(m => (m.ts.getTime, m.msg_id)).foreach { m =>
      val changed = last match {
        case None => true
        case Some(prev) => !java.util.Arrays.equals(prev, m.value)
      }
      if (changed) out += CdcEvent(topic, m.ts, m.msg_id, m.value)
      last = Some(m.value)
    }
    last.foreach(state.update)
    out.result().iterator
  }
}
