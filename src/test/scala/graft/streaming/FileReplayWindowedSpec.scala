package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MqttQueries

/** Append-mode windowed aggregation through the file stream source: every
  * window is finalized exactly once when the watermark passes its end, so
  * the complete emitted set must equal the batch tumbling-window result.
  * The flush sentinel (a synthetic topic 3 h past the real max event time)
  * must advance the watermark past every real window and never appear in
  * the output.
  */
class FileReplayWindowedSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }.toSeq).toSeq

  private def batchRows: Seq[Seq[Any]] =
    rows(MqttQueries.windowedCounts(spark, sf0001)
      .withColumn("win_start", col("win_start").cast("timestamp_ntz")))

  test("append-mode file replay emits exactly the batch window set") {
    val batch = batchRows
    assert(batch.nonEmpty)
    val streamed = rows(FileReplayWindowed.hourlyStats(spark, sf0001))
    assert(streamed == batch)
    assert(!streamed.exists(_.contains(FileReplayWindowed.FlushTopic)),
      "flush sentinel leaked into the aggregated output")
  }

  test("windows spanning file-batch boundaries finalize once (finer chunking)") {
    val batch = batchRows
    val streamed = rows(FileReplayWindowed.hourlyStats(spark, sf0001, chunks = 5))
    assert(streamed == batch)
  }
}
