package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-series burstiness audit — the Poisson-overdispersion screen on
  * arrival counts: a series whose hourly-count variance far exceeds its
  * mean (Fano factor ≫ 1) is bursty (thundering herds, retry storms,
  * batch uploads), which changes capacity planning and anomaly
  * thresholds. Runs over the ZERO-FILLED dense hourly grid
  * ([[Resample.hourly]] — the certified stage, consumed verbatim): a
  * silent hour is a real zero observation, and skipping it would bias
  * the variance down exactly when the series is burstiest.
  *
  * Exactness — no division until the final milli report: with H hours,
  * total T and sum of squares S, the scaled variance numerator is
  * `H·S − T²` (pure integer products), and the var-to-mean ratio is
  * reported as `(H·S − T²)·1000 div (H·T)` — a non-negative integer div
  * on both engines (Cauchy-Schwarz makes the numerator ≥ 0; T > 0 for
  * every live series). Long headroom: H·S at 1000x this corpus is
  * ~1e13.
  *
  * Scale shape: everything after the Resample stage's one data-sized
  * aggregation is a fold of the (series x hours) bucket table to
  * |series| rows.
  */
object Burstiness {

  /** (event_type, n_hours, total_events, disp_num, fano_milli). */
  def report(events: DataFrame): DataFrame =
    Resample.hourly(events)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n_events")).as("total_events"),
        sum(col("n_events") * col("n_events")).as("__sumsq"))
      .select(col("event_type"), col("n_hours"), col("total_events"),
        (col("n_hours") * col("__sumsq") -
          col("total_events") * col("total_events")).as("disp_num"))
      .withColumn("fano_milli",
        expr("(disp_num * 1000) div (n_hours * total_events)"))
      .orderBy(col("event_type"))

  /** Driver query: the burstiness audit of the events stream. */
  def reportEvents(spark: SparkSession, dir: String): DataFrame =
    report(Tables.events(spark, dir))
}

/** DuckDB oracle for [[Burstiness]] — the same dense-grid CTE
  * ([[Resample.hourlyEventsSql]] verbatim), the same integer dispersion.
  */
object BurstinessSql {

  val reportEventsSql: String =
    s"""WITH dense AS (${Resample.hourlyEventsSql}),
       |agg AS (
       |  SELECT event_type, count(*) AS n_hours,
       |    CAST(sum(n_events) AS BIGINT) AS total_events,
       |    CAST(sum(n_events * n_events) AS BIGINT) AS sumsq
       |  FROM dense GROUP BY 1)
       |SELECT event_type, n_hours, total_events,
       |  n_hours * sumsq - total_events * total_events AS disp_num,
       |  ((n_hours * sumsq - total_events * total_events) * 1000) //
       |    (n_hours * total_events) AS fano_milli
       |FROM agg ORDER BY event_type""".stripMargin
}
