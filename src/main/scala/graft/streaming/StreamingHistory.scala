package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.MqttQueries
import graft.sources.mqtt.MqttBroker

/** The reference's defining path — streaming ingestion feeding trigger CDC
  * (/root/reference/mqtt2sql.py:762-787 callback -> mysql.sql:78-91 trigger
  * cascade) — executed END-TO-END through Structured Streaming and exposed as
  * a driver-checkable query: the replay messages are published into the
  * [[graft.sources.mqtt.MqttSourceProvider]] DSv2 source (the same seam a
  * live paho client feeds), consumed under `Trigger.AvailableNow` with
  * `maxOffsetsPerTrigger` splitting the backlog into multiple REAL
  * micro-batches (per-topic GroupState carried across them through
  * [[StatefulCdc.changes]]), then the emitted CDC events get the same id
  * assignment + topic-dimension join as the batch form.
  *
  * Its oracle is [[MqttQueries.historySql]] — the SAME SQL that checks the
  * batch `lag`-window form — so a green row here certifies the
  * incremental-equals-batch property (SURVEY §5.2d) against DuckDB, not just
  * against our own batch implementation.
  *
  * Scale: the stateful operator hash-partitions by topic and holds one
  * payload per key; the driver-side publish loop is the single-subscription
  * ingest seam (see MqttSource scaladoc), everything downstream is
  * partitioned execution.
  */
object StreamingHistory {

  /** Run the streaming CDC over the sf replay frame in ~`chunks` micro-batches
    * and return the history table `(id, ts, topicid, value_hex)`. Two batches
    * by default: enough to cross a batch boundary (the state-carry property;
    * StreamingCdcSpec exercises many-batch sequences at unit scale) without
    * paying N x per-trigger overhead in the bench.
    */
  def history(spark: SparkSession, dir: String, chunks: Int = 2): DataFrame = {
    import spark.implicits._
    val m = MqttQueries.replayMessages(spark, dir)
    // driver-side publish in arrival order ([[Replay]], the ingest seam
    // shared with StreamingState); buffer positions become msg_ids,
    // preserving the (ts, msg_id) total order the CDC and id assignment
    // sort by
    val (broker, n) = Replay.publish(m, "history")
    val name = s"mqtt_cdc_stream_$broker"
    val events = try {
      // state sized to the topic keyspace (hundreds), a per-stream decision;
      // the clone-at-start contract is documented at
      // ReplayHarness.runWithStatePartitions
      val q = ReplayHarness.runWithStatePartitions(spark, 8) {
        val stream = spark.readStream
          .format("graft.sources.mqtt.MqttSourceProvider")
          .option("broker", broker)
          .option("maxOffsetsPerTrigger", Replay.perTrigger(n, chunks).toString)
          .load()
        StatefulCdc.changes(stream.as[MqttMsg])
          .writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      try q.awaitTermination() finally q.stop()
      // detach results from the memory sink before dropping its registration
      spark.table(name).as[CdcEvent].collect().toSeq
    } finally {
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      MqttBroker.clear(broker)
    }
    val kept = spark.createDataset(events).toDF()
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .select(col("ts"), col("topic"), col("value"), col("msg_id"))
    // the SAME post-processing as the batch query — the two paths can only
    // differ in how `kept` was produced (lag window vs GroupState)
    MqttQueries.finishHistory(kept, m)
  }
}
