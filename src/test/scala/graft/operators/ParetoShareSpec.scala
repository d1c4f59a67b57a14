package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pareto-share semantics: the decile rule over the (spend desc, custkey)
  * total order, curve monotonicity, and the multi-weight prefix scan.
  */
class ParetoShareSpec extends SparkSpec {
  import spark.implicits._

  test("deciles and shares are exact on a hand-checked input") {
    // 10 customers, spends 100..1000 cents (customer k spends k*100 -> one
    // per decile; rank r = customer (11-r))
    val orders = (1 to 10).map(k => (k.toLong, k.toDouble)).toDF("o_custkey", "o_totalprice")
    val got = ParetoShare.report(orders)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 10)
    val total = (1 to 10).map(_ * 100L).sum // 5500
    var cum = 0L
    got.zipWithIndex.foreach { case ((dec, n, band, cumGot, ppm), i) =>
      val spend = (10 - i) * 100L // decile i holds the (10-i)-spender
      cum += spend
      assert(dec == i && n == 1L && band == spend && cumGot == cum)
      assert(ppm == cum * 1000000L / total)
    }
  }

  test("multi-weight scan: rank lane equals ContiguousId semantics") {
    val df = Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("k", "w")
    val got = PrefixSum.withRunningTotals(df, Seq("w", "w"), Seq("c1", "c2"),
        Seq(col("k")))
      .orderBy(col("k")).as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 10L, 10L, 10L), (2L, 20L, 30L, 30L),
      (3L, 30L, 60L, 60L)))
  }

  test("the driver query produces a monotone curve ending at 1e6") {
    val df = ParetoShare.reportOrders(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(df.length == 10 && df.map(_._1).toSeq == (0L to 9L))
    // top decile carries more than an equal share; curve is monotone
    assert(df.head._5 > 100000L)
    assert(df.map(_._5).sliding(2).forall(p => p(0) < p(1)))
    assert(df.last._5 == 1000000L)
    assert(df.map(_._4).sliding(2).forall(p => p(0) < p(1)))
  }
}
