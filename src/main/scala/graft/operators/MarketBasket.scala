package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket association mining — the co-occurrence lift table behind
  * recommendation and assortment analysis, and (in a training-data
  * pipeline) the same statistical machinery as collocation extraction
  * applied to the relational side: for every pair of parts bought together
  * in at least [[MinPairSupport]] orders, how far above independence the
  * pair sits. lift(p₁,p₂) = P(p₁,p₂)/(P(p₁)·P(p₂)) = n₁₂·N/(n₁·n₂) over
  * basket (= order) counts; lift ≈ 1 is chance, ≫ 1 is an association
  * rule worth surfacing.
  *
  * Scale shape: the basket table is the DISTINCT (order, part) projection
  * (two columns off the fact scan), cached because four consumers read it
  * (the basket total, the per-part marginal, both sides of the pair
  * self-join). Pair generation self-joins ON THE ORDER KEY, so candidates
  * are bounded by C(items-per-order, 2) per basket — items/order is a
  * small constant (TPC-H ≤ 7), never all-pairs over the part domain. The
  * pair count is one map-side-combined shuffle on (p1, p2); the marginal
  * joins are vocabulary-sized; N joins in as a broadcast SINGLE-ROW
  * aggregate (the text_tfidf shape — one counted nested-loop row); the
  * final top-k is TakeOrdered, never a global sort materialization.
  *
  * Exactness: lift is reported as the integer-exact
  * `lift_ppm = n_both·N·1e6 div (n₁·n₂)` — every factor a basket count,
  * so the division is non-negative integer `div` (identical to DuckDB
  * `//` there; numerator ≤ N²·1e6 ≈ 2.3e16 at sf0.1, far inside int64).
  * No ln, no doubles anywhere. Ties in lift_ppm rank by (p1, p2).
  */
object MarketBasket {

  /** Pairs co-occurring in fewer baskets than this are dropped. */
  val MinPairSupport = 3L

  /** Association rules reported. */
  val TopK = 100

  /** (p1, p2, n_both, n_p1, n_p2, lift_ppm): the [[TopK]] strongest
    * part-pair associations by lift.
    */
  def lift(lineitem: DataFrame): DataFrame = {
    val baskets = Caching.cached(
      lineitem.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct())
    val n = baskets.agg(countDistinct(col("o")).as("__n"))
    val perPart = baskets.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= MinPairSupport)
    pairs
      .join(perPart.select(col("p").as("p1"), col("n_p").as("n_p1")), Seq("p1"))
      .join(perPart.select(col("p").as("p2"), col("n_p").as("n_p2")), Seq("p2"))
      .join(broadcast(n))
      .select(col("p1"), col("p2"), col("n_both"), col("n_p1"), col("n_p2"),
        expr("(n_both * __n * 1000000) div (n_p1 * n_p2)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("p1"), col("p2"))
      .limit(TopK)
  }

  /** Driver query: part-pair lift over the lineitem baskets. */
  def liftLineitem(spark: SparkSession, dir: String): DataFrame =
    lift(Tables.lineitem(spark, dir))
}

/** DuckDB oracle for [[MarketBasket]] — same distinct basket projection,
  * same ordered-pair self-join, same integer-exact lift, same
  * (lift desc, p1, p2) total order.
  */
object MarketBasketSql {

  val liftLineitemSql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |n AS (SELECT count(DISTINCT o) AS nn FROM baskets),
       |per_part AS (SELECT p, count(*) AS n_p FROM baskets GROUP BY 1),
       |pairs AS (
       |  SELECT a.p AS p1, b.p AS p2, count(*) AS n_both
       |  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2
       |  HAVING count(*) >= ${MarketBasket.MinPairSupport})
       |SELECT p1, p2, n_both, c1.n_p AS n_p1, c2.n_p AS n_p2,
       |  (n_both * nn * 1000000) // (c1.n_p * c2.n_p) AS lift_ppm
       |FROM pairs
       |JOIN per_part c1 ON c1.p = p1
       |JOIN per_part c2 ON c2.p = p2
       |CROSS JOIN n
       |ORDER BY lift_ppm DESC, p1, p2
       |LIMIT ${MarketBasket.TopK}""".stripMargin
}
