package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Point-in-interval range join, bucketed.
  *
  * Spark's native plan for a `p BETWEEN start AND end` join predicate is a
  * nested-loop join (no equi-key to hash on) — quadratic, the shape
  * PlanAuditSpec bans repo-wide. The scalable form: explode each interval
  * into the day buckets it covers, equi-join points to buckets on the
  * truncated day, then apply the exact containment filter as a residual.
  * Fan-out is interval-length-in-days per row (bounded by the domain, not
  * the table sizes), the join is a plain hash/sort-merge equi-join, and the
  * residual keeps the operator exact for arbitrary (non-midnight)
  * timestamps. Same technique as [[AsOfJoin]]'s single-shuffle union-merge:
  * restructure the predicate so the engine gets an equi-key.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    // an inverted interval must match NOTHING (BETWEEN semantics), not
    // crash the job — Spark's sequence() throws on start > stop
    val buckets = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(date_trunc("DAY", col(startCol)),
          date_trunc("DAY", col(endCol)), expr("interval 1 day"))))
    points.withColumn("__pb", date_trunc("DAY", col(pointCol)))
      .join(buckets, col("__pb") === col("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket", "__pb")
  }

  /** Driver query: shipments in transit (14-day window from ship date) on
    * each distinct order date — a point-in-interval join aggregated to one
    * row per date.
    *
    * Pre-aggregation before the range join: the in-transit count depends
    * only on `l_shipdate`, so lineitem first collapses to one weighted row
    * per distinct ship date (a map-side-combined shuffle to date
    * cardinality — thousands of rows at ANY table scale), and the bucketed
    * range join + final sum run on the collapsed frame. Without this the
    * interval explode fans out per LINEITEM row (15x the fact table through
    * the join); with it, fan-out is 15x the date domain. The classic
    * push-partial-aggregation-below-the-join rewrite, done by hand because
    * the aggregate's grain (a join input column) is invisible to Catalyst
    * across the explode.
    */
  def inTransitCounts(spark: SparkSession, dir: String): DataFrame = {
    val points = Tables.orders(spark, dir).select(col("o_orderdate")).distinct()
    val intervals = Tables.lineitem(spark, dir)
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("__n"))
      .withColumn("l_ship_end", expr("l_shipdate + interval 14 days"))
    pointInInterval(points, "o_orderdate", intervals, "l_shipdate", "l_ship_end")
      .groupBy(col("o_orderdate"))
      .agg(sum(col("__n")).as("n_in_transit"))
      .orderBy(col("o_orderdate"))
  }

  val inTransitCountsSql: String =
    """WITH p AS (SELECT DISTINCT o_orderdate FROM orders)
      |SELECT p.o_orderdate, count(*) AS n_in_transit
      |FROM p JOIN lineitem l
      |  ON p.o_orderdate BETWEEN l.l_shipdate AND l.l_shipdate + INTERVAL 14 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
