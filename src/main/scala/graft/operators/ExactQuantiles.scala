package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** EXACT per-group median and p90 — the ground truth next to
  * `q_approx_quantiles`' KLL estimates: order statistics at exact ranks,
  * computed WITHOUT a per-group data window (the windowed spelling
  * funnels each group through one task — the quality-filter lesson).
  *
  * Scale shape: ONE range shuffle over (group, value, id) through
  * [[ContiguousId]] puts every group in a contiguous run; per-group
  * ranks are global positions minus the broadcast per-group offsets
  * (the [[StratifiedSplit]] construction), and the two order statistics
  * fall out of one conditional fold — rank equality against the
  * integer rank formulas `⌈n/2⌉` and `⌈9n/10⌉`.
  *
  * Exactness: values fold to integer cents; ranks are exact under the
  * (cents, event_id) total order; the rank formulas are non-negative
  * integer arithmetic (`(n + 1) div 2`, `(9n + 9) div 10`).
  */
object ExactQuantiles {

  /** (event_type, n, median_cents, p90_cents): lower median and exact
    * ceil-rank p90 per event type.
    */
  def medians(events: DataFrame): DataFrame = {
    val vals = events.select(col("event_type"), col("event_id"),
      floor(col("value") * 100).cast("long").as("cents"))
    val counts = vals.groupBy(col("event_type")).agg(count(lit(1)).as("n_s"))
    // |types| rows: the single-partition window is over the tiny count
    // table, never the data
    val wt = Window.orderBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("offset", sum(col("n_s")).over(wt) - col("n_s"))
    ContiguousId.assign(vals, "gpos",
        Seq(col("event_type"), col("cents"), col("event_id")))
      .join(broadcast(offsets), Seq("event_type"))
      .select(col("event_type"), col("n_s"), col("cents"),
        (col("gpos") - col("offset")).as("rank"))
      .groupBy(col("event_type"))
      .agg(first(col("n_s")).as("n"),
        max(when(col("rank") === expr("(n_s + 1) div 2"), col("cents")))
          .as("median_cents"),
        max(when(col("rank") === expr("(9 * n_s + 9) div 10"), col("cents")))
          .as("p90_cents"))
      .orderBy(col("event_type"))
  }

  /** Driver query: exact medians of the events value stream. */
  def mediansEvents(spark: SparkSession, dir: String): DataFrame =
    medians(Tables.events(spark, dir))
}

/** DuckDB oracle for [[ExactQuantiles]] — the windowed row_number
  * spelling the offset construction is provably equivalent to, same
  * cents and rank formulas.
  */
object ExactQuantilesSql {

  val mediansEventsSql: String =
    """WITH v AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT event_type, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cents, event_id) AS rank,
      |    count(*) OVER (PARTITION BY event_type) AS n_s
      |  FROM v)
      |SELECT event_type, CAST(max(n_s) AS BIGINT) AS n,
      |  max(CASE WHEN rank = (n_s + 1) // 2 THEN cents END)
      |    AS median_cents,
      |  max(CASE WHEN rank = (9 * n_s + 9) // 10 THEN cents END)
      |    AS p90_cents
      |FROM r GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
