package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Exact-quantile semantics: the lower-median and ceil-p90 rank rules
  * on hand-checked groups, and agreement with a sorted reference.
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("median and p90 ranks are exact on hand-checked groups") {
    // type a: cents 100..500 (n=5) -> median rank 3 (300), p90 rank
    // ceil(4.5)=5 (500); type b: n=4 -> median rank 2, p90 rank 4
    val rows =
      (1 to 5).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 10L + i, i * 10.0))
    val df = rows.toDF("event_type", "event_id", "value")
    val got = ExactQuantiles.medians(df)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 5L, 300L, 500L), ("b", 4L, 2000L, 4000L)))
  }

  test("the driver medians agree with a sorted in-memory reference") {
    val events = graft.sources.Tables.events(spark, sf0001)
    val ref = events
      .select($"event_type", $"event_id",
        org.apache.spark.sql.functions.floor($"value" * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._2)).map(_._3)
        val n = sorted.length
        (t, n.toLong, sorted((n + 1) / 2 - 1), sorted((9 * n + 9) / 10 - 1))
      }.toSeq.sortBy(_._1)
    val got = ExactQuantiles.mediansEvents(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == ref)
  }
}
