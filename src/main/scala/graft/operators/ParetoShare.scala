package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Revenue-concentration (Lorenz / Pareto) report — "what share of total
  * spend do the top 10%, 20%, ... of customers carry": customers ranked
  * by lifetime spend, the cumulative spend curve cut at customer-count
  * deciles. The instrument behind every "80/20" capacity and skew
  * decision (and, on a corpus, the source-concentration twin of
  * `q_skew_profile`).
  *
  * Scale shape: orders collapse to the per-customer spend table with ONE
  * map-side-combined shuffle; rank and cumulative spend then come from a
  * SINGLE [[PrefixSum.withRunningTotals]] two-phase scan (rank is the
  * weight ≡ 1 lane — one range shuffle total, never a one-partition
  * global window). The grand totals (customer count, total cents) are a
  * single-row aggregate of the CACHED spend table broadcast back (the
  * counted single-row BNLJ pattern); the decile fold is |customers| →
  * [[Bands]] rows. Orders are read once, the spend table twice from
  * cache — nothing corpus-sized runs twice.
  *
  * Exactness: prices fold to integer cents via `floor(price·100)` —
  * IEEE double multiply + floor is bit-equal cross-engine (the
  * [[BoundedTopK]] idiom); ranks over the (spend desc, custkey) total
  * order; `div` on non-negative integers everywhere;
  * cum_share_ppm = cum_cents·1e6 div total_cents.
  */
object ParetoShare {

  /** Number of rank-quantile bands in the report. */
  val Bands = 10

  /** (decile, n_customers, band_cents, cum_cents, cum_share_ppm), decile
    * 0 = the top-spending tenth of purchasing customers; `cum_cents` and
    * `cum_share_ppm` are the curve at the band's lower (last-included)
    * rank boundary.
    */
  def report(orders: DataFrame): DataFrame = {
    val spend = Caching.cached(orders
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .withColumn("__one", lit(1L)))
    val totals = spend.agg(count(lit(1)).as("__n"),
      sum(col("cents")).as("__total"))
    val scanned = PrefixSum.withRunningTotals(spend,
      Seq("cents", "__one"), Seq("__cum", "__rank"),
      Seq(col("cents").desc, col("o_custkey")))
    scanned.join(broadcast(totals))
      .select(col("cents"), col("__cum"), col("__total"),
        expr(s"((__rank - 1) * $Bands) div __n").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("band_cents"),
        max(col("__cum")).as("cum_cents"),
        first(col("__total")).as("__total"))
      .select(col("decile"), col("n_customers"), col("band_cents"),
        col("cum_cents"),
        expr("(cum_cents * 1000000) div __total").as("cum_share_ppm"))
      .orderBy(col("decile"))
  }

  /** Driver query: the customer revenue-concentration report. */
  def reportOrders(spark: SparkSession, dir: String): DataFrame =
    report(Tables.orders(spark, dir))
}

/** DuckDB oracle for [[ParetoShare]] — the plain windowed spelling of the
  * same curve: row_number + running sum over (spend desc, custkey), same
  * integer cents, same decile rule.
  */
object ParetoShareSql {

  val reportOrdersSql: String =
    s"""WITH spend AS (
       |  SELECT o_custkey,
       |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY 1),
       |ranked AS (
       |  SELECT cents,
       |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn,
       |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM spend),
       |tot AS (
       |  SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total
       |  FROM spend)
       |SELECT ((rn - 1) * ${ParetoShare.Bands}) // n AS decile,
       |  count(*) AS n_customers,
       |  CAST(sum(cents) AS BIGINT) AS band_cents,
       |  max(cum) AS cum_cents,
       |  (max(cum) * 1000000) // total AS cum_share_ppm
       |FROM ranked, tot
       |GROUP BY decile, total
       |ORDER BY decile""".stripMargin
}
