package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Single-row distributional skew profile of a key column — the summary
  * that decides whether a shuffle needs the skew playbook at all, and
  * which lever ([[SaltedJoin]] salting, AQE skew-split, broadcast) fits:
  * key cardinality, count percentiles, the hot-tail's share of all rows,
  * and max/mean as an integer-ppm skew ratio.
  *
  * Complements [[HeavyHitters]] (WHICH keys are hot) with HOW SKEWED the
  * whole distribution is. Scale shape: one key-partitioned aggregation
  * over the data (map-side combined) — after that, every rank, percentile
  * pick, and ratio runs on key-CARDINALITY rows. Percentiles are exact
  * order statistics (row_number against a computed index, all-integer
  * `div` arithmetic), not approximations, and shares are integer ppm —
  * no float boundary can flip a reported figure between engines.
  */
object SkewReport {

  def profile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // key-cardinality surface from here down: single-partition windows over
    // one row per key (the HeavyHitters ranking pattern)
    val wAsc = Window.orderBy(col("cnt").asc, col(keyCol))
    val wDesc = Window.orderBy(col("cnt").desc, col(keyCol))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("rk_asc", row_number().over(wAsc))
      .withColumn("rk_desc", row_number().over(wDesc))
      .withColumn("nk", count(lit(1)).over(wAll))
      .agg(
        max(col("nk")).cast("long").as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        // exact order statistics: the value at the floored-index position
        // of the ascending count order (ties share a value, so tie order
        // cannot change the pick)
        max(when(col("rk_asc") === expr("(nk - 1) div 2") + 1, col("cnt")))
          .as("p50_cnt"),
        max(when(col("rk_asc") === expr("(nk - 1) * 99 div 100") + 1, col("cnt")))
          .as("p99_cnt"),
        sum(when(col("rk_desc") <= topK, col("cnt")).otherwise(0L))
          .as("__topk_rows"))
      .select(
        col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"),
        expr("(__topk_rows * 1000000L) div n_rows").as(s"top${topK}_share_ppm"),
        // max/mean in ppm: mean = n_rows/n_keys, folded into one integer div
        expr("(max_cnt * n_keys * 1000000L) div n_rows").as("skew_ppm"))
  }

  /** Driver query: the skew profile of the orders fact's customer key —
    * the distribution [[HeavyHitters.hotCustomers]] ranks the head of.
    */
  def orderCustomerSkew(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir).select(col("o_custkey")), "o_custkey")

  val orderCustomerSkewSql: String =
    """WITH counts AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT cnt, o_custkey,
      |    row_number() OVER (ORDER BY cnt ASC, o_custkey) AS rk_asc,
      |    row_number() OVER (ORDER BY cnt DESC, o_custkey) AS rk_desc,
      |    CAST(count(*) OVER () AS BIGINT) AS nk
      |  FROM counts)
      |SELECT max(nk) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  max(cnt) AS max_cnt,
      |  max(CASE WHEN rk_asc = (nk - 1) // 2 + 1 THEN cnt END) AS p50_cnt,
      |  max(CASE WHEN rk_asc = (nk - 1) * 99 // 100 + 1 THEN cnt END) AS p99_cnt,
      |  CAST(sum(CASE WHEN rk_desc <= 10 THEN cnt ELSE 0 END) * 1000000
      |    // sum(cnt) AS BIGINT) AS top10_share_ppm,
      |  CAST(max(cnt) * max(nk) * 1000000 // sum(cnt) AS BIGINT) AS skew_ppm
      |FROM ranked""".stripMargin
}
