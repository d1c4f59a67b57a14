package graft.operators

import graft.SparkSpec

/** Lift semantics on a hand-checked basket input: the ordered-pair
  * domain, the support floor, and the exact integer lift values.
  */
class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets; parts 1,2 always together (perfect association), part 3
  // independent filler. Duplicate lines in basket 10 must not double-count.
  private def li = Seq(
    (10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L),
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 2L), (30L, 3L),
    (40L, 3L)
  ).toDF("l_orderkey", "l_partkey")

  test("lift is exact on a hand-checked input and dedupes basket lines") {
    val got = MarketBasket.lift(li)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // pair (1,2): n_both=3, n_1=3, n_2=3, N=4 -> lift = 3*4/(3*3) = 4/3
    assert(got((1L, 2L)) == ((1L, 2L, 3L, 3L, 3L, 1333333L)))
    // pair (1,3) co-occurs twice, (2,3) twice: below the support floor of 3
    assert(got.size == 1)
  }

  test("pairs are strictly ordered (no self-pairs, no mirrored duplicates)") {
    val rows = MarketBasket.lift(li.unionAll(li)) // more weight, same sets
      .select("p1", "p2").as[(Long, Long)].collect()
    assert(rows.forall { case (a, b) => a < b })
  }

  test("the driver query returns associations on the sf0.001 corpus") {
    val df = MarketBasket.liftLineitem(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= MarketBasket.TopK)
    // lift is the leading sort key, descending
    val lifts = rows.map(_.getLong(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }
}
