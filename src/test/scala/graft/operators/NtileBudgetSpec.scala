package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** NTILE quartile report + corpus token budget accounting. */
class NtileBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("quartile sizes follow the NTILE remainder rule and partition each group") {
    val got = Relational.ntileQuartiles(spark, sf0001)
      .select($"event_type", $"quartile", $"n")
      .as[(String, Int, Long)].collect()
    val byType = Tables.events(spark, sf0001)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (et, rows) =>
      val sizes = rows.sortBy(_._2).map(_._3)
      assert(sizes.sum == byType(et))
      // NTILE: earlier buckets absorb the remainder, sizes differ by <= 1
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.toSeq == sizes.sortBy(x => -x).toSeq, sizes.toSeq)
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }

  test("token budget sums exactly to the corpus totals and matches split assignment") {
    val got = TextAnalysis.tokenBudget(Tables.documents(spark, sf0001))
      .as[(String, String, Long, Long)].collect()
    val totalDocs = Tables.documents(spark, sf0001).count()
    assert(got.map(_._3).sum == totalDocs)
    // per-(lang, split) doc counts match an independent derivation
    val expected = TextAnalysis.split(Tables.documents(spark, sf0001))
      .groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == expected)
    // token totals are positive wherever documents exist
    assert(got.forall(r => r._4 >= r._3)) // every doc has >= 1 token slot
  }
}
