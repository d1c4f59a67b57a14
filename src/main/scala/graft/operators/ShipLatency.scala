package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Order-to-ship latency histogram — the fulfillment SLA curve AND the
  * date-integrity audit in one: for every lineitem, SIGNED whole days
  * between its order date and its ship date, folded to a day-count
  * histogram. Positive days are the shipping curve every ops review
  * starts from; NEGATIVE days are ship-before-order rows — referential
  * nonsense a real warehouse flags immediately (the driver fixture's
  * dates are uncorrelated, so the audit half of the report is the live
  * half here).
  *
  * Scale shape: ONE orderkey equi-join (orders is the PK side — at
  * scale a shuffle hash join on the natural key both tables already
  * cluster by; nothing here fights the planner), then one map-side
  * combined fold to the day domain.
  *
  * Exactness: both date columns are midnight-aligned (suite-pinned), so
  * the epoch-micro difference is an EXACT multiple of 86400e6 and the
  * day division has zero remainder — truncating (Spark `div`) and
  * flooring (DuckDB `//`) agree even where the gap is negative.
  */
object ShipLatency {

  /** (days, n_items) per whole-day latency, by days. */
  def histogram(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    lineitem.select(col("l_orderkey").as("o_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .join(orders.select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us")),
        Seq("o_orderkey"))
      .select(expr("(ship_us - order_us) div 86400000000").as("days"))
      .groupBy(col("days"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("days"))
  }

  /** Driver query: the latency histogram of the TPC-H order flow. */
  def histogramTables(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
}

/** DuckDB oracle for [[ShipLatency]] — same epoch arithmetic, same
  * fold.
  */
object ShipLatencySql {

  val histogramTablesSql: String =
    """SELECT (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
      |    // 86400000000 AS days,
      |  count(*) AS n_items
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY days""".stripMargin
}
