package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-weighted value aggregation over irregular event series — THE
  * canonical sensor/telemetry query in the reference's own domain (a
  * reading holds until the next sample; a plain average over-weights
  * bursts): per (user, event_type) series, each reading is weighted by
  * how long it held (gap to the next event of that series), emitting the
  * integer pieces of the time-weighted mean.
  *
  * Exactness: durations are exact `unix_micros` differences floored to
  * ms (`div 1000`, non-negative); values use the corpus's established
  * cent scaling (`floor(value·100)`, IEEE-identical on both engines);
  * the weighted sum Σ dur_ms·cents is a pure INTEGER. No division is
  * emitted — the mean is `weighted_cent_ms / dur_ms_total` downstream.
  * Int64 bound: ~month-long gaps × the value range × series length stay
  * under 10^17 at gate scales; a deployment swaps the sum to
  * DECIMAL(38,0)/HUGEINT, shape unchanged.
  *
  * Scale shape: the `lead()` window partitions by the SERIES key
  * (user × type) — telemetry's high-cardinality key, each series small,
  * so per-key windows are the honest construction here (unlike the
  * per-source windows the percentile/budget operators avoid: 20 sources
  * is a skew hazard; millions of series are the partitioning). One
  * exchange on the series key, reused by the fold.
  */
object TimeWeighted {

  /** (user_id, event_type, n_intervals, dur_ms_total, weighted_cent_ms). */
  def perSeries(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"),
        // NTZ -> LTZ under the pinned UTC session, then exact micros —
        // equal to DuckDB's epoch_us on the naive timestamp
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_ms", expr("(next_us - us) div 1000"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_ms")).as("dur_ms_total"),
        sum(col("dur_ms") * col("cents")).as("weighted_cent_ms"))
  }

  /** Driver query: time-weighted series aggregates of the events table. */
  def perSeriesEvents(spark: SparkSession, dir: String): DataFrame =
    perSeries(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("event_type"))
}

/** DuckDB oracle for [[TimeWeighted]] — same micros gaps, same cent
  * scaling, same integer sums.
  */
object TimeWeightedSql {

  val perSeriesEventsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CAST(floor(value * 100) AS BIGINT) AS cents,
      |    epoch_us(ts) AS us
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |iv AS (
      |  SELECT user_id, event_type, cents,
      |    (lead(us) OVER (PARTITION BY user_id, event_type
      |       ORDER BY ts, event_id) - us) // 1000 AS dur_ms
      |  FROM e)
      |SELECT user_id, event_type,
      |  CAST(count(*) AS BIGINT) AS n_intervals,
      |  CAST(sum(dur_ms) AS BIGINT) AS dur_ms_total,
      |  CAST(sum(dur_ms * cents) AS BIGINT) AS weighted_cent_ms
      |FROM iv WHERE dur_ms IS NOT NULL
      |GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin
}
