package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.ContiguousId
import graft.operators.MqttQueries
import graft.sources.mqtt.MqttBroker

/** The reference's OTHER sink — the keyed `mqtt` state table upsert
  * (`INSERT ... ON DUPLICATE KEY UPDATE`, /root/reference/mqtt2sql.py:579-629)
  * — run END-TO-END through Structured Streaming and exposed as a
  * driver-checkable query: replay messages are published into the DSv2
  * source, consumed under Trigger.AvailableNow in multiple micro-batches,
  * and each batch is merged into the keyed state by
  * [[UpsertSink.merge]] (the same foreachBatch body the JDBC MERGE variant
  * shares). The final state's VALUES come entirely from the streaming
  * merge; only the surrogate ids (a function of first-publish order, which
  * the reference's autoincrement assigns at insert time) are derived from
  * the replay frame, exactly as the batch form does.
  *
  * Oracle: [[MqttQueries.stateSql]] — the same DuckDB SQL that checks the
  * batch state table, so the micro-batch upsert's convergence to
  * last-committed-message-per-topic is certified against an independent
  * engine.
  */
object StreamingState {

  private val runId = new AtomicInteger(0)

  def state(spark: SparkSession, dir: String, chunks: Int = 2): DataFrame = {
    import spark.implicits._
    val m = MqttQueries.replayMessages(spark, dir)
    val rows = m.select(col("msg_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("topic"), col("value"), col("qos"), col("retain"))
      .orderBy(col("us"), col("msg_id"))
      .collect()
    val broker = s"state_replay_${runId.incrementAndGet()}"
    MqttBroker.clear(broker)
    rows.foreach { r =>
      MqttBroker.publish(broker, r.getString(2), r.getAs[Array[Byte]](3),
        qos = r.getInt(4), retain = r.getInt(5) != 0, tsMicros = r.getLong(1))
    }
    val perTrigger = math.max(1L, math.ceil(rows.length.toDouble / chunks).toLong)
    val work = Files.createTempDirectory("mqtt_state_stream").toFile.getAbsolutePath
    val statePath = s"$work/state"
    val q = spark.readStream
      .format("graft.sources.mqtt.MqttSourceProvider")
      .option("broker", broker)
      .option("maxOffsetsPerTrigger", perTrigger.toString)
      .load()
      // buffer positions are this run's arrival ids; carry the ORIGINAL
      // msg_id payload-side so the merge tiebreak matches the batch replay
      .writeStream
      .foreachBatch(UpsertSink.merge(statePath) _)
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    MqttBroker.clear(broker)
    val merged = spark.read.parquet(statePath)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .select(col("topic"), col("ts"), col("value"), col("qos"), col("retain"))
    // surrogate ids in first-publish order (the reference's insert-order
    // autoincrement) — an arrival-order dimension of the input, same as the
    // batch stateTable derives
    val firstArrival = m.groupBy(col("topic"))
      .agg(min(col("msg_id")).as("first_arrival"))
    val withArrival = merged.join(firstArrival, Seq("topic"))
    ContiguousId.assign(withArrival, "id", Seq(col("first_arrival")))
      .select(col("id"), col("ts"), col("topic"),
        hex(col("value")).as("value_hex"), col("qos"), col("retain"))
      .orderBy(col("id"))
  }
}
