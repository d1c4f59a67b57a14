package graft.operators

import graft.SparkSpec

/** Source-overlap semantics: shared-shingle counting, Jaccard ppm
  * arithmetic, pair ordering, and corpus non-vacuity.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("shared shingles count once per pair, jaccard is exact ppm") {
    // srcA and srcB share exactly the 3 trigrams of "a b c d e"; srcB adds
    // the 4 disjoint trigrams of "p q r s t u"; srcC shares nothing
    val docs = Seq(
      (1L, "a b c d e", "srcA"),
      (2L, "a b c d e", "srcB"),
      (3L, "p q r s t u", "srcB"),
      (4L, "x y z w v", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = SourceOverlap.overlap(docs)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // only the (srcA, srcB) pair shares content
    assert(got.map(r => (r._1, r._2)).toSeq == Seq(("srcA", "srcB")))
    val (_, _, shared, na, nb, ppm) = got.head
    assert((shared, na, nb) == ((3L, 3L, 7L)))
    assert(ppm == 3L * 1000000L / (3L + 7L - 3L))
  }

  test("corpus run: pairs ordered, counts bounded by universes, non-vacuous") {
    val got = SourceOverlap.overlapDocuments(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "no cross-source shingle overlap found")
    got.foreach { r =>
      assert(r._1 < r._2)
      assert(r._3 <= math.min(r._4, r._5))
      assert(r._6 >= 0L && r._6 <= 1000000L)
    }
    assert(got.map(r => (r._1, r._2)).toSeq ==
      got.map(r => (r._1, r._2)).sorted.toSeq)
  }
}
