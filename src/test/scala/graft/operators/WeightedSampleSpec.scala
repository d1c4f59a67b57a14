package graft.operators

import graft.SparkSpec

/** Weighted hash-replication sampling: weighting actually biases, the
  * sample is deterministic and content-addressed, priorities are minima.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Long)*) = rows.toDF("doc_id", "n_chars")

  test("weights map n_chars through the capped divisor") {
    val got = WeightedSample.sample(
      docs(1L -> 0L, 2L -> 99L, 3L -> 100L, 4L -> 350L, 5L -> 10000L), k = 5)
      .select($"doc_id", $"weight").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 4L, 5L -> 8L), got)
  }

  test("heavier docs win proportionally more often") {
    // 1000 docs, half weight 1 (n_chars 0) and half weight 8 (n_chars 9999):
    // a weight-8 doc holds 8 lottery tickets — expect ~8/9 of the sample
    val rows = (0L until 1000L).map(i => i -> (if (i % 2 == 0) 0L else 9999L))
    val sample = WeightedSample.sample(docs(rows: _*), k = 90)
      .select($"weight").as[Long].collect()
    val heavy = sample.count(_ == 8L)
    assert(heavy > 60 && heavy < 90, s"heavy=$heavy of 90")
  }

  test("the sample is deterministic and partitioning/append-invariant") {
    val base = (0L until 400L).map(i => i -> (i * 13 % 700))
    val a = WeightedSample.sample(docs(base: _*).repartition(1), k = 50).collect()
    val b = WeightedSample.sample(docs(base: _*).repartition(17), k = 50).collect()
    assert(a.sameElements(b))
    // appending new docs never flips an existing doc's priority: the old
    // sample's priorities are a superset-stable prefix
    val extended = base ++ (1000L until 1100L).map(i => i -> 50L)
    val c = WeightedSample.sample(docs(extended: _*), k = 50)
      .select($"doc_id", $"priority").as[(Long, Long)].collect().toMap
    val aMap = WeightedSample.sample(docs(base: _*), k = 50)
      .select($"doc_id", $"priority").as[(Long, Long)].collect().toMap
    aMap.foreach { case (id, p) =>
      c.get(id).foreach(cp => assert(cp == p, s"priority moved for $id")) }
  }
}
