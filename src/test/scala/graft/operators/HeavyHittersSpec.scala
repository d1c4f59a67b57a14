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

  // ---- bounded-state (Misra-Gries) form ------------------------------------

  test("bounded form equals the exact form when capacity covers the distinct keys") {
    val rows = (1L to 8L).flatMap(k => Seq.fill(k.toInt)(k))
    val df = rows.toDF("k").repartition(4)
    val exact = HeavyHitters.topKeys(df, "k", 5)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val bounded = HeavyHitters.boundedTopKeys(df, "k", 5, capacity = 64)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(bounded == exact)
  }

  test("per-partition summaries cap state and keep the sentinel total exact") {
    val keys = spark.createDataset((1L to 1000L).map(_ % 97))(
      org.apache.spark.sql.Encoders.scalaLong).repartition(4)
    val summ = HeavyHitters.mgSummaries(keys, capacity = 8).collect().toSeq
    // never more than capacity counters (+1 sentinel) per partition
    assert(summ.count(_.k.isEmpty) == 4)
    assert(summ.count(_.k.nonEmpty) <= 4 * 8)
    // the sentinels carry the exact row total even though counters decrement
    assert(summ.filter(_.k.isEmpty).map(_.cnt).sum == 1000L)
  }

  test("Misra-Gries guarantee in the decremented regime: hot keys survive with lower-bound counts") {
    // 10_000 rows: key 1 has 4000, key 2 has 2000, 4000 singleton keys.
    // capacity 16 << 4002 distinct forces constant decrementing.
    val rows = Seq.fill(4000)(1L) ++ Seq.fill(2000)(2L) ++
      (10L to 4009L).map(identity)
    // interleave deterministically so hot keys don't arrive in one run
    val shuffled = rows.sortBy(k => (k * 2654435761L) % 104729L)
    val df = shuffled.toDF("k").repartition(4)
    val capacity = 16
    val n = rows.length
    val out = HeavyHitters.boundedTopKeys(df, "k", 2, capacity)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // any key with true count > n/(capacity+1) (= 588) MUST be returned,
    // with count >= true - n/(capacity+1) and <= true
    assert(out.map(_._2) == Seq(1L, 2L), out.toString)
    val bound = n / (capacity + 1)
    val counts = out.map(t => t._2 -> t._3).toMap
    assert(counts(1L) <= 4000L && counts(1L) >= 4000L - bound, counts.toString)
    assert(counts(2L) <= 2000L && counts(2L) >= 2000L - bound, counts.toString)
    // share denominator is the exact total (sentinels), not the counter sum
    val share1 = out.find(_._2 == 1L).get._4
    assert(share1 == counts(1L) * 1000000L / n, out.toString)
  }

  test("bounded form is deterministic run-to-run") {
    val rows = (1L to 5000L).map(_ % 131)
    val df = rows.toDF("k").repartition(8)
    val a = HeavyHitters.boundedTopKeys(df, "k", 10, capacity = 32)
      .collect().map(_.toSeq).toSeq
    val b = HeavyHitters.boundedTopKeys(df, "k", 10, capacity = 32)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
