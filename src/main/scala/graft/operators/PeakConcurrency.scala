package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Peak session concurrency — the classic interval sweep: how many user
  * sessions were simultaneously open at the busiest instant, and when
  * that instant first occurred. The capacity-planning number every
  * serving team asks of an events table.
  *
  * Semantics: sessions are the certified `q_session_windows` stage
  * VERBATIM (30-minute gap windows, end = last event + gap), active on
  * the half-open [start, end) — at an instant where one session ends
  * exactly as another starts, the −1 applies first (the sweep orders
  * (us, d) with d ascending), so back-to-back sessions never double
  * count.
  *
  * Scale shape: the sweep's running sum is [[PrefixSum]] over the
  * (us, d, user_id, start_us) TOTAL order (session endpoints of one
  * user are pairwise distinct, so the tiebreak chain is total) — one
  * range shuffle over 2 rows per session, never a single-partition
  * global window; the peak extraction is one fold plus a single-row
  * broadcast back (counted BNLJ).
  *
  * Exactness: exact epoch micros, ±1 integer weights, min/max only.
  */
object PeakConcurrency {

  /** One row: (max_concurrent, first_peak_us). */
  def peak(sessions: DataFrame): DataFrame = {
    val su = unix_micros(col("session_start").cast("timestamp"))
    val sweep = sessions
      .select(su.as("us"), lit(1L).as("d"), col("user_id"), su.as("su"))
      .unionAll(sessions.select(
        unix_micros(col("session_end").cast("timestamp")).as("us"),
        lit(-1L).as("d"), col("user_id"), su.as("su")))
    val run = PrefixSum.withRunningTotal(sweep, "d", "cum",
      Seq(col("us"), col("d"), col("user_id"), col("su")))
    val mx = run.agg(max(col("cum")).as("max_concurrent"))
    run.join(broadcast(mx))
      .filter(col("cum") === col("max_concurrent"))
      .groupBy(col("max_concurrent"))
      .agg(min(col("us")).as("first_peak_us"))
  }

  /** Driver query: the peak over the events table's session windows. */
  def peakEvents(spark: SparkSession, dir: String): DataFrame =
    peak(Relational.sessionWindows(spark, dir))
}

/** DuckDB oracle for [[PeakConcurrency]] — the session CTE embedded
  * verbatim, the same ordered sweep as a running window.
  */
object PeakConcurrencySql {

  val peakEventsSql: String =
    s"""WITH sess AS (${Relational.sessionWindowsSql}),
       |sweep AS (
       |  SELECT epoch_us(session_start) AS us, CAST(1 AS BIGINT) AS d,
       |    user_id, epoch_us(session_start) AS su
       |  FROM sess
       |  UNION ALL
       |  SELECT epoch_us(session_end), CAST(-1 AS BIGINT), user_id,
       |    epoch_us(session_start)
       |  FROM sess),
       |run AS (
       |  SELECT us, CAST(sum(d) OVER (ORDER BY us, d, user_id, su
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM sweep),
       |mx AS (SELECT max(cum) AS max_concurrent FROM run)
       |SELECT max_concurrent, min(us) AS first_peak_us
       |FROM run, mx WHERE cum = max_concurrent
       |GROUP BY 1""".stripMargin
}
