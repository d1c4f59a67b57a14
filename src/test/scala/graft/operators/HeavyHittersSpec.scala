package graft.operators

import graft.SparkSpec

/** Heavy-hitter profile: exact counts/ranks/shares vs a driver-side model,
  * and the aggregate-then-rank shape (the window runs on key-cardinality
  * rows — a single aggregation of the data, no second scan).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("ranks, counts, and integer ppm shares match a driver-side model") {
    // key i appears i times: 1..8 -> 36 rows, hottest key is 8
    val rows = (1L to 8L).flatMap(k => Seq.fill(k.toInt)(k))
    val out = HeavyHitters.topKeys(rows.toDF("k"), "k", 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val total = rows.length
    val expected = Seq(8L, 7L, 6L).zipWithIndex.map { case (k, i) =>
      (i + 1, k, k, k * 1000000L / total)
    }
    assert(out == expected)
  }

  test("ties rank deterministically by key ascending") {
    val df = Seq(1L, 1L, 2L, 2L, 3L).toDF("k")
    val out = HeavyHitters.topKeys(df, "k", 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("exactly one data-sized aggregation: the plan has one hash exchange before the windows") {
    val df = HeavyHitters.topKeys((1L to 100L).toDF("k"), "k", 5)
    val plan = df.queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the groupBy shuffle; the windows run single-partition on aggregated keys
    assert(hashExchanges == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
