package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Inter-event think-time histogram — the distribution of per-user gaps
  * between consecutive events, in second decades (0-9 s, 10-99 s, ...):
  * the instrument behind session-timeout selection (the knee of this
  * histogram IS the natural session gap) and bot detection (a spike in
  * the 0-9 s band at scale is automation).
  *
  * Scale shape: one per-user event-time window (the session machinery's
  * partitioning — data-sized but keyed, never global), then ONE
  * map-side-combined fold to the ~log10(max gap) decade domain.
  *
  * Exactness: gaps are non-negative integer second `div`s of exact epoch
  * micros under the (ts, event_id) total order; the decade is the
  * string-length integer log10 (the [[Zipf]] spelling); counts/min/max
  * only.
  */
object GapHistogram {

  /** (decade, n_gaps, min_gap_s, max_gap_s) per gap decade. */
  def decades(events: DataFrame): DataFrame = {
    // ordering by epoch micros is the (ts, event_id) order: unix_micros
    // is strictly monotone in ts
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr("(us - prev) div 1000000").as("gap_s"))
      .select((length(col("gap_s").cast("string")) - 1).cast("long")
        .as("decade"), col("gap_s"))
      .groupBy(col("decade"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
      .orderBy(col("decade"))
  }

  /** Driver query: the think-time histogram of the events stream. */
  def decadesEvents(spark: SparkSession, dir: String): DataFrame =
    decades(Tables.events(spark, dir))
}

/** DuckDB oracle for [[GapHistogram]] — the same lag window under the
  * same total order, same integer second decades.
  */
object GapHistogramSql {

  val decadesEventsSql: String =
    """WITH g AS (
      |  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
      |  FROM events)
      |SELECT CAST(length(CAST(gap_s AS VARCHAR)) - 1 AS BIGINT) AS decade,
      |  count(*) AS n_gaps, min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY 1 ORDER BY decade""".stripMargin
}
