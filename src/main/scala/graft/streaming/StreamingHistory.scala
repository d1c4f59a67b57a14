package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{ContiguousId, MqttPipeline, MqttQueries}

/** The reference's defining path — streaming ingestion feeding trigger CDC
  * (/root/reference/mqtt2sql.py:762-787 callback -> mysql.sql:78-91 trigger
  * cascade) — executed END-TO-END through Structured Streaming and exposed as
  * a driver-checkable query: the replay messages are fed through
  * [[StatefulCdc.changes]] in multiple real micro-batches (MemoryStream,
  * per-topic GroupState carried across batches), then the emitted CDC events
  * get the same id assignment + topic-dimension join as the batch form.
  *
  * Its oracle is [[MqttQueries.historySql]] — the SAME SQL that checks the
  * batch `lag`-window form — so a green row here certifies the
  * incremental-equals-batch property (SURVEY §5.2d) against DuckDB, not just
  * against our own batch implementation.
  *
  * Scale: the stateful operator hash-partitions by topic and holds one
  * payload per key; the driver-side MemoryStream feed is the test harness'
  * seam (a real deployment reads [[graft.sources.mqtt.MqttSourceProvider]];
  * same operator either way).
  */
object StreamingHistory {

  private val runId = new AtomicInteger(0)

  /** Run the streaming CDC over the sf replay frame in `chunks` micro-batches
    * and return the history table `(id, ts, topicid, value_hex)`.
    */
  def history(spark: SparkSession, dir: String, chunks: Int = 4): DataFrame = {
    import spark.implicits._
    val m = MqttQueries.replayMessages(spark, dir)
    // driver-side feed in arrival order (the harness seam, not the operator):
    // chunk boundaries are micro-batch boundaries, so state genuinely carries
    // across triggers
    val all = m.withColumn("ts", col("ts").cast("timestamp"))
      .as[MqttMsg].collect().sortBy(x => (x.ts.getTime, x.msg_id))
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[MqttMsg]
    val name = s"mqtt_cdc_stream_${runId.incrementAndGet()}"
    // state-store partition count is fixed at the query's first run from
    // spark.sql.shuffle.partitions; the keyspace is topic-sized (hundreds),
    // so 32 partitions x N batches just multiplies per-partition checkpoint
    // commits. Size the stateful shuffle to the keyspace for this query and
    // restore the session conf after (a real deployment sets it once at
    // query start — state partitioning is a per-stream, not per-session,
    // decision).
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val q = try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      StatefulCdc.changes(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      val size = math.max(1, (all.length + chunks - 1) / chunks)
      all.grouped(size).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // detach results from the memory sink before dropping its registration
    val events = spark.table(name).as[CdcEvent].collect().toSeq
    spark.catalog.dropTempView(name)
    val kept = spark.createDataset(events).toDF()
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .select(col("ts"), col("topic"), col("value"), col("msg_id"))
    // identical post-processing to MqttQueries.history: contiguous history
    // ids in arrival order, topicid resolved via the broadcast state dim
    val h = ContiguousId.assign(kept, "id", Seq(col("ts"), col("msg_id")))
    val dim = MqttPipeline.stateTable(m).select(col("id").as("topicid"), col("topic"))
    h.join(broadcast(dim), Seq("topic"))
      .select(col("id"), col("ts"), col("topicid"), hex(col("value")).as("value_hex"))
      .orderBy(col("id"))
  }
}
