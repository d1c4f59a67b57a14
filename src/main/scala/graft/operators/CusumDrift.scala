package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** CUSUM changepoint statistic per event type — where in time a series'
  * level most departs from its own mean: the cumulative deviation
  * D_h = Σ_{i≤h}(x_i − mean), peaked at the regime boundary. The drift
  * alarm a pipeline owner puts on ingest volume/value series; the hour
  * at the peak IS the estimated changepoint.
  *
  * Exactness — NO division anywhere: with H hours and total T, the
  * H-scaled deviation is D_h·H = cum_h·H − h·T, pure integer products of
  * certified hourly cents (the [[Resample]] stage, consumed verbatim —
  * the zero-filled grid matters: a silent hour IS maximal deviation).
  * The statistic `max |D_h·H|` and its earliest peak hour are exact;
  * D_H·H = 0 by construction (the fold closes). Tie rule: earliest hour.
  *
  * Scale shape: everything after the Resample stage's one data-sized
  * aggregation runs on the (type × hours) bucket table — the per-type
  * running index is a window over bucket rows, the totals broadcast
  * back, and the peak extraction is one more bucket-sized fold. Long
  * headroom: |D·H| ≤ T·H ~ 1e15 at 1000× this corpus.
  */
object CusumDrift {

  /** (event_type, n_hours, total_cents, max_dev_habs, peak_hour):
    * `max_dev_habs` is the peak |cumulative deviation| scaled by
    * n_hours; `peak_hour` its earliest attaining hour.
    */
  def drift(events: DataFrame): DataFrame = {
    // the dense grid's data-sized aggregation feeds two consumers (tot,
    // dev) and the deviation frame two more (peak, the final join) — both
    // are (type x hours)-bucket tables, so caching them is KBs and cuts
    // the Resample replay per consumer (plan index: 13 → 5 exchanges)
    val dense = Caching.cached(Resample.hourly(events))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val tot = dense.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("value_cents")).as("total_cents"))
    val dev = Caching.cached(dense
      .withColumn("idx", row_number().over(w).cast("long"))
      .join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("n_hours"),
        col("total_cents"),
        abs(col("cum_cents") * col("n_hours") - col("idx") * col("total_cents"))
          .as("habs")))
    val peak = dev.groupBy(col("event_type"))
      .agg(max(col("habs")).as("max_dev_habs"))
    dev.join(broadcast(peak), Seq("event_type"))
      .filter(col("habs") === col("max_dev_habs"))
      .groupBy(col("event_type"))
      .agg(first(col("n_hours")).as("n_hours"),
        first(col("total_cents")).as("total_cents"),
        first(col("max_dev_habs")).as("max_dev_habs"),
        min(col("hour")).as("peak_hour"))
      .orderBy(col("event_type"))
  }

  /** Driver query: the changepoint report over the events stream. */
  def driftEvents(spark: SparkSession, dir: String): DataFrame =
    drift(Tables.events(spark, dir))
}

/** DuckDB oracle for [[CusumDrift]] — the SAME dense-grid SQL
  * ([[Resample.hourlyEventsSql]] embedded verbatim as a CTE), the same
  * H-scaled integer deviation, the same earliest-peak tie rule.
  */
object CusumDriftSql {

  val driftEventsSql: String =
    s"""WITH dense AS (${Resample.hourlyEventsSql}),
       |tot AS (
       |  SELECT event_type, count(*) AS n_hours,
       |    CAST(sum(value_cents) AS BIGINT) AS total_cents
       |  FROM dense GROUP BY 1),
       |dev AS (
       |  SELECT d.event_type, d.hour, t.n_hours, t.total_cents,
       |    abs(d.cum_cents * t.n_hours -
       |        (row_number() OVER (PARTITION BY d.event_type
       |                            ORDER BY d.hour)) * t.total_cents)
       |      AS habs
       |  FROM dense d JOIN tot t USING (event_type)),
       |peak AS (
       |  SELECT event_type, max(habs) AS max_dev_habs
       |  FROM dev GROUP BY 1)
       |SELECT event_type, n_hours, total_cents, max_dev_habs,
       |  min(hour) AS peak_hour
       |FROM dev JOIN peak USING (event_type)
       |WHERE habs = max_dev_habs
       |GROUP BY event_type, n_hours, total_cents, max_dev_habs
       |ORDER BY event_type""".stripMargin
}
