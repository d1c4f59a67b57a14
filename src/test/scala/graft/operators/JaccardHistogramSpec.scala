package graft.operators

import graft.SparkSpec

/** Band semantics on hand-checked overlap plus corpus conservation
  * against the shared scored-pair stage.
  */
class JaccardHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bands and ppm bounds are exact on hand-checked overlap") {
    // 3-gram shingles: A/B identical (J=1), C shares 3 of 5 union (J=0.6)
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "a b c d e z")
    ).toDF("doc_id", "text")
    val got = JaccardHistogram.histogram(docs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 2)
    assert(got(6L) == ((6L, 2L, 600000L, 600000L)))
    assert(got(10L) == ((10L, 1L, 1000000L, 1000000L)))
  }

  test("the histogram conserves the scored-pair count on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val hist = JaccardHistogram.histogram(docs)
      .as[(Long, Long, Long, Long)].collect()
    val nPairs = Dedup.jaccardScoredPairs(docs).count()
    assert(hist.map(_._2).sum == nPairs && nPairs > 0)
    // ppm extremes stay inside their band
    hist.foreach { case (b, _, lo, hi) =>
      assert(lo >= b * 100000 && (b == 10L || hi < (b + 1) * 100000), s"band $b")
    }
  }

  test("the refactored dedup filter still reports the same pairs") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val viaStage = Dedup.jaccardScoredPairs(docs)
      .filter($"jaccard" >= 0.4).count()
    assert(Dedup.ngramJaccard(docs).count() == viaStage)
  }
}
