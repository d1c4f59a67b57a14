package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series gap fill: resample an event stream to a complete fixed-grain
  * grid (every hour between a key's first and last event, present or not),
  * so downstream windows see a dense, regular series — the precondition for
  * trailing averages, rate-of-change, and burn-down style analytics, where
  * a silently missing bucket reads as "no change" instead of zero.
  *
  * Scale shape: the only data-sized operation is ONE keyed aggregation to
  * (key, hour) buckets (map-side combined). The grid is then generated
  * FROM the aggregates — per-key span min/max, `sequence`-exploded to
  * key×hours rows — and the fill join plus the cumulative window run
  * entirely on bucket-cardinality rows, never data rows. Money stays in
  * integer cents (floor(value*100), Long sums), so the zero-fill and the
  * running total are bit-exact under any aggregation order.
  */
object Resample {

  def hourly(events: DataFrame, keyCol: String = "event_type"): DataFrame = {
    val hour = date_trunc("hour", col("ts")).cast("timestamp_ntz")
    val buckets = events.groupBy(col(keyCol), hour.as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    // bucket-cardinality surface from here down
    val grid = buckets.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    grid.join(buckets, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("cents"), lit(0L)).as("value_cents"))
      .withColumn("cum_cents", sum(col("value_cents"))
        .over(Window.partitionBy(col(keyCol)).orderBy(col("hour"))))
      .orderBy(col(keyCol), col("hour"))
  }

  /** Driver query: dense hourly activity per event type. */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    hourly(Tables.events(spark, dir))

  val hourlyEventsSql: String =
    """WITH buckets AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(hour) AS h0, max(hour) AS h1
      |  FROM buckets GROUP BY 1),
      |grid AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM span)
      |SELECT g.event_type, g.hour,
      |  CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events,
      |  CAST(COALESCE(b.cents, 0) AS BIGINT) AS value_cents,
      |  CAST(sum(COALESCE(b.cents, 0))
      |    OVER (PARTITION BY g.event_type ORDER BY g.hour) AS BIGINT) AS cum_cents
      |FROM grid g LEFT JOIN buckets b USING (event_type, hour)
      |ORDER BY event_type, hour""".stripMargin
}
