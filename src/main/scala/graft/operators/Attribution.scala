package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product-analytics primitives over the event stream:
  *
  *  - FIRST/LAST-touch attribution: per user, the first and last event
  *    type with timestamps — the two endpoints every attribution model
  *    interpolates between.
  *  - The event-type TRANSITION matrix: counts of consecutive
  *    (prev → next) type pairs across all users, with integer-ppm shares
  *    of each row's outgoing mass — the Markov view of product flow.
  *
  * Exactness: all strings, counts, and exact micros timestamps; shares
  * are `count·1e6 div row_total` (non-negative integer division). Both
  * operators order by the (ts, event_id) total order, spelled as
  * `row_number`/`lead` windows — identical on both engines.
  *
  * Scale shape: windows partition by USER — the high-cardinality key
  * (each user's series is small), the honest per-key construction, and
  * the same exchange serves both endpoints and transitions. The
  * transition aggregation collapses map-side to |types|² rows.
  */
object Attribution {

  /** (user_id, n_events, first_type, first_ts, last_type, last_ts). */
  def firstLastTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wn = Window.partitionBy(col("user_id"))
    events.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(wn))
      .filter(col("rn") === 1 || col("rn") === col("n_events"))
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        min_by(col("event_type"), col("rn")).as("first_type"),
        min_by(col("ts"), col("rn")).as("first_ts"),
        max_by(col("event_type"), col("rn")).as("last_type"),
        max_by(col("ts"), col("rn")).as("last_ts"))
  }

  /** (prev_type, next_type, n, share_ppm): the transition matrix. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type").as("prev_type"),
        col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(n * 1000000) div row_total").as("share_ppm"))
  }

  /** Driver query: first/last-touch endpoints per user. */
  def firstLastTouchEvents(spark: SparkSession, dir: String): DataFrame =
    firstLastTouch(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Driver query: the event-type transition matrix. */
  def transitionsEvents(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables.events(spark, dir))
      .orderBy(col("prev_type"), col("next_type"))
}

/** DuckDB oracles for [[Attribution]] — same windows, same total order,
  * same integer shares.
  */
object AttributionSql {

  val firstLastTouchEventsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
      |SELECT user_id,
      |  CAST(max(n_events) AS BIGINT) AS n_events,
      |  arg_min(event_type, rn) AS first_type,
      |  arg_min(ts, rn) AS first_ts,
      |  arg_max(event_type, rn) AS last_type,
      |  arg_max(ts, rn) AS last_ts
      |FROM e WHERE rn = 1 OR rn = n_events
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val transitionsEventsSql: String =
    """WITH p AS (
      |  SELECT event_type AS prev_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
      |      FROM c GROUP BY 1)
      |SELECT c.prev_type, c.next_type, c.n,
      |  (c.n * 1000000) // t.row_total AS share_ppm
      |FROM c JOIN t USING (prev_type)
      |ORDER BY c.prev_type, c.next_type""".stripMargin
}
