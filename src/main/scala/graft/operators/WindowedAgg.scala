package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation (SURVEY §2.7 ST2 extension).
  *
  * The reference has no windows (payloads are stamped with receipt time and
  * overwritten); a 100 TB telemetry pipeline does: per-key, per-interval
  * rollups are the first aggregation any monitoring/training-data job runs.
  * One plan, two execution modes:
  *
  *  - batch: `groupBy(window(ts, 1h), topic)` — a plain hash aggregate,
  *    map-side partial then one shuffle keyed by (window, topic);
  *  - streaming: the SAME expression under `readStream` with
  *    `withWatermark` bounding state (see [[graft.streaming.WindowedStats]])
  *    — windows older than the watermark are finalized, emitted once
  *    (append mode), and their state evicted; later-than-watermark stragglers
  *    are dropped. State per key is one window's partial aggregate, so a
  *    1000-executor cluster shards it by hash with no coordination.
  */
object WindowedAgg {

  /** (win_start, topic, n_msgs, total_bytes) per 1-hour epoch-aligned
    * tumbling window.
    */
  def hourlyStats(msgs: DataFrame): DataFrame =
    msgs
      .groupBy(window(col("ts"), "1 hour"), col("topic"))
      .agg(count("*").as("n_msgs"), sum(length(col("value"))).as("total_bytes"))
      .select(col("window.start").as("win_start"), col("topic"),
        col("n_msgs"), col("total_bytes"))
}
