package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.M4Downsample
import graft.sources.Tables

/** Streaming twin of [[M4Downsample]]: the event stream arrives as file
  * micro-batches while every pixel bucket's four M4 points update
  * incrementally — the live dashboard maintenance path, where a chart
  * stays render-exact without ever re-reading the stream.
  *
  * The incremental side is [[M4Downsample.aggregated]] VERBATIM as an
  * update-mode streaming aggregation: the state per live (series,
  * bucket) is four candidate tuples + a count — bucket-cardinality,
  * independent of stream length. Every emitted running extreme is
  * MONOTONE under its struct's lexicographic order (first/min tuples
  * only decrease, last/max tuples only increase, counts only grow), so
  * the readback fold is the same min/max over emissions,
  * batch-order-independent — the monotone-fold discipline extended from
  * scalars to ORDERED TUPLES (the tuple carries (us, event_id) so even
  * value ties fold deterministically). [[M4Downsample.flatten]] then
  * projects the shared presentation tail. Certified against the SAME
  * oracle as the batch form; chunking-invariance pinned in
  * StreamingM4Spec.
  */
object StreamingM4 {

  /** Driver query: same M4 reduction as `q_m4_downsample`, maintained
    * incrementally over `chunks` real file-source micro-batches.
    */
  def downsampleFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, events, chunks, statePartitions = 4, prefix = "m4_file",
      outputMode = "update", col("ts"), col("event_id")) { stream =>
      M4Downsample.aggregated(stream)
    }
    M4Downsample.flatten(
      emissions.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("n_points")).as("n_points"),
          min(col("__f")).as("__f"), max(col("__l")).as("__l"),
          min(col("__mn")).as("__mn"), max(col("__mx")).as("__mx")))
  }
}
