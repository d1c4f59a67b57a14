package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.sources.Tables

/** Top-k per group WITHOUT a global sort: the [[graft.functions.TopKAgg]]
  * bounded aggregate, demonstrated against the same ranking the window
  * queries ([[Relational.windowTop3]], [[Relational.topKOrders]]) compute
  * with `row_number()`.
  *
  * Plan shape: one hash-aggregate pair (partial in the scan stage, final
  * after a group-key exchange whose payload is O(k) per group per mapper),
  * then a narrow posexplode. The window form's exchange carries the whole
  * fact table and sorts it; this one carries bounded buffers. The oracle is
  * the window form in DuckDB — proving bounded-merge top-k ≡ sort top-k.
  */
object BoundedTopK {

  /** Driver query: top 5 orders by price within each order priority,
    * ranked (cents DESC, o_orderkey ASC). Prices fold to integer cents
    * before ranking (the repo's exactness discipline) and unfold for
    * display — cents < 2^53, so `cents / 100.0` is exact in both engines.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(TopKAgg.agg(col("cents"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("o_orderkey"),
        (col("col.value").cast("double") / 100.0).as("total_price"))
      .orderBy(col("o_orderpriority"), col("rank"))

  val topOrdersPerPrioritySql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
      |               o_orderkey) AS rnk
      |  FROM orders)
      |SELECT o_orderpriority, CAST(rnk AS INT) AS rank, o_orderkey,
      |  CAST(cents AS DOUBLE) / 100.0 AS total_price
      |FROM ranked WHERE rnk <= 5
      |ORDER BY o_orderpriority, rank""".stripMargin
}
