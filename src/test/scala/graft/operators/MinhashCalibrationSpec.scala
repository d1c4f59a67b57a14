package graft.operators

import graft.SparkSpec

/** Calibration semantics: cell totals conserve the candidate-pair
  * population, exact duplicates land in the (10, 10) corner, and bands
  * stay in range.
  */
class MinhashCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("identical documents land in the (10, 10) corner") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = MinhashCalibration.contingency(docs)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 10L, 1L)))
  }

  test("cells conserve the candidate-pair population and stay in range") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val sets = Caching.cached(Dedup.hashedShingleSets(docs, Dedup.ShingleN))
    val nCand = Dedup.minhashCandidatePairs(sets, Dedup.MaxBucket,
      "calib_spec_caps").count()
    val cells = MinhashCalibration.contingencyDocuments(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(cells.nonEmpty && cells.map(_._3).sum == nCand)
    cells.foreach { c =>
      assert(c._1 >= 0 && c._1 <= 10 && c._2 >= 0 && c._2 <= 10)
    }
  }
}
