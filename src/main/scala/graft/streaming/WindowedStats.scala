package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.WindowedAgg

/** Streaming form of [[WindowedAgg.hourlyStats]]: the identical aggregation
  * expression under a watermark. Append mode emits each window exactly once
  * when the watermark (max event time − delay) passes its end, then evicts
  * its state — the bounded-state contract that makes event-time windows
  * viable on an unbounded 100 TB/day stream. Events arriving later than the
  * watermark are dropped (counted by Spark's stateOperators metrics,
  * numRowsDroppedByWatermark — never silent).
  */
object WindowedStats {

  def hourlyStats(stream: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    WindowedAgg.hourlyStats(stream.withWatermark("ts", watermarkDelay))
}
