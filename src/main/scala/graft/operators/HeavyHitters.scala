package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact heavy-hitter profile of a key column — the diagnostic that decides
  * the skew playbook ([[SaltedJoin]]'s scaladoc): which keys are hot, and
  * what fraction of all rows they carry.
  *
  * Scale shape: ONE key-partitioned aggregation over the data (map-side
  * combined), after which everything — total, share, ranking — runs on
  * key-CARDINALITY rows, never data rows. The total comes from an
  * empty-frame window sum over the aggregated counts (a single-partition
  * pass over keys, not a second scan of the data), and the share is exact
  * integer parts-per-million (count * 1e6 div total), so no float boundary
  * can flip a rank or a reported share.
  *
  * (A Misra-Gries / count-min pass can replace the exact aggregate when
  * even key cardinality overwhelms memory; at that point the [[Sketches]]
  * family's bounded-state designs apply. The exact form is the oracle-
  * verifiable contract.)
  */
object HeavyHitters {

  def topKeys(df: DataFrame, keyCol: String, topN: Int): DataFrame =
    rankCounts(df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows")), keyCol, topN)

  /** The ranking/share tail over already-aggregated (key, n_rows) counts —
    * shared with the streaming twin ([[graft.streaming.StreamingHeavyHitters]]),
    * whose state IS these counters maintained incrementally. Runs on
    * key-cardinality rows only.
    */
  def rankCounts(counts: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(col("n_rows").desc, col(keyCol))
    counts
      .withColumn("__total", sum(col("n_rows")).over(wAll))
      // integral div, not float division — exact ppm on both engines
      .withColumn("share_ppm", expr("(n_rows * 1000000L) div __total"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topN)
      .select(col("rank"), col(keyCol), col("n_rows"), col("share_ppm"))
      .orderBy(col("rank"))
  }

  /** Driver query: the 10 hottest customer keys of the orders fact table —
    * exactly the profile that would size [[SaltedJoin]]'s salt count.
    */
  def hotCustomers(spark: SparkSession, dir: String): DataFrame =
    topKeys(Tables.orders(spark, dir).select(col("o_custkey")), "o_custkey", 10)

  val hotCustomersSql: String =
    """WITH counts AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT o_custkey, n_rows,
      |    CAST(n_rows * 1000000 // sum(n_rows) OVER () AS BIGINT) AS share_ppm,
      |    row_number() OVER (ORDER BY n_rows DESC, o_custkey) AS rank
      |  FROM counts)
      |SELECT CAST(rank AS INT) AS rank, o_custkey, n_rows, share_ppm
      |FROM ranked WHERE rank <= 10
      |ORDER BY rank""".stripMargin
}
