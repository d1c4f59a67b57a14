package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.MqttQueries

/** The event-time windowed aggregation (ST2) certified END-TO-END as a
  * streaming query in APPEND mode — the mode a production job runs,
  * because it is the one with the bounded-state contract: a window is
  * emitted exactly ONCE when the watermark passes its end, and its state
  * evicts. (The existing WindowedStatsSpec asserts plan equivalence; this
  * query makes the full watermark lifecycle a driver-checked certificate
  * against the SAME oracle as the batch `mqtt_windowed_counts`.)
  *
  * Append mode only finalizes windows the watermark has passed, so a
  * bounded replay would otherwise never emit its trailing windows: ONE
  * FLUSH SENTINEL (excluded-from-results topic, event time 3 h past the
  * real maximum) arrives in its own final file-batch. The watermark is
  * computed at the END of batch N and applied (state emitted and evicted)
  * during batch N+1 — which for the sentinel batch is the trailing
  * NO-DATA micro-batch Spark runs before AvailableNow terminates
  * (`spark.sql.streaming.noDataMicroBatches.enabled`, on by default), so
  * a second sentinel batch is redundant (rounds 1-13 carried two; r14
  * profiling showed each sentinel batch costs ~0.6 s of pure
  * state-commit overhead and the spec re-proved the single-sentinel
  * equality). The sentinel is dropped from the aggregated output — the
  * standard end-of-stream flush pattern for certifying append-mode
  * windows over finite input. Ingest is the distributed file-source
  * staging (no driver-side input materialization; the only driver-visible
  * scalars are max(ts)/max(msg_id) for sentinel construction).
  */
object FileReplayWindowed {

  val FlushTopic = "__wm_flush"

  def hourlyStats(spark: SparkSession, dir: String, chunks: Int = 3,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    val m = MqttQueries.replayMessages(spark, dir)
    val work = java.nio.file.Files.createTempDirectory("graft_file_windowed").toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      val staged = m.select(col("msg_id"), col("ts").cast("timestamp").as("ts"),
        col("topic"), col("value"), col("qos"), col("retain"))
      FileStage.stage(staged, inDir, chunks, col("ts"), col("msg_id"))
      // the flush sentinel: one row, 3 h past the real max event time, in
      // its own LAST-scheduled file-batch (watermark advance; the trailing
      // no-data batch performs the flush)
      val bounds = staged.agg(max(col("ts")), max(col("msg_id"))).head()
      val sentinel = Seq((bounds.getLong(1) + 1L,
        new Timestamp(bounds.getTimestamp(0).getTime + 3L * 3600 * 1000),
        FlushTopic, Array.empty[Byte], 0, 0))
        .toDF("msg_id", "ts", "topic", "value", "qos", "retain")
      FileStage.appendSentinel(sentinel, inDir, chunks, 0)
      val outDir = new java.io.File(work, "out").getAbsolutePath
      val ckDir = new java.io.File(work, "ck").getAbsolutePath
      var schema: org.apache.spark.sql.types.StructType = null
      // noDataBatches stays ON: the sentinel flush depends on the trailing
      // no-data batch applying the advanced watermark (scaladoc above)
      val q = ReplayHarness.runWithStatePartitions(spark, 8) {
        val stream = spark.readStream
          .schema(staged.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir)
        // NOTE: the sentinel filter must NOT be part of the streaming
        // plan — a `topic =!= FlushTopic` predicate here gets pushed
        // below the EventTimeWatermark operator (topic is not the event
        // -time column), so the sentinel rows would be dropped at the
        // scan and never advance the watermark. It is applied at the
        // sink readback below instead.
        val out = WindowedStats.hourlyStats(stream, watermarkDelay)
        schema = out.schema
        // file-sink readback (r22): finalized windows are
        // window-cardinality (corpus-scale), so they ride a distributed
        // parquet sink, never the driver-resident memory sink
        out.writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckDir)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      try q.awaitTermination() finally q.stop()
      // the flush-sentinel windows are dropped here, post-sink
      ReplayHarness.pinnedParquet(spark, schema, outDir)
        .filter(col("topic") =!= FlushTopic)
        .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
        .select(col("win_start"), col("topic"), col("n_msgs"),
          col("total_bytes"))
        .orderBy(col("win_start"), col("topic"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
