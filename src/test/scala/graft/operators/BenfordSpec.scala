package graft.operators

import graft.SparkSpec

/** Benford-report semantics: exact digit extraction, the shared
  * expectation literals, and share conservation.
  */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("digits and deviations are exact on a hand-checked input") {
    // digits: 1 x2 (1200.5, 150), 9 x1 (999.99), 3 x1 (30000)
    val orders = Seq(1200.5, 150.0, 999.99, 30000.0).toDF("o_totalprice")
    val got = Benford.report(orders)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 500000L), (3L, 1L, 250000L), (9L, 1L, 250000L)))
    got.foreach { r =>
      assert(r._4 == Benford.ExpectedPpm(r._1.toInt - 1))
      assert(r._5 == r._3 - r._4)
    }
  }

  test("the driver report covers all nine digits and conserves shares") {
    val n = graft.sources.Tables.orders(spark, sf0001).count()
    val got = Benford.reportOrders(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (1L to 9L))
    assert(got.map(_._2).sum == n)
    val s = got.map(_._3).sum
    assert(s <= 1000000L && s > 1000000L - 9)
  }
}
