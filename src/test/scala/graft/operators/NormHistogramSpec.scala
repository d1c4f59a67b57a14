package graft.operators

import graft.SparkSpec

/** Norm-band semantics on hand-checked vectors plus corpus conservation. */
class NormHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("micro norms and bands are exact on hand-checked vectors") {
    val emb = Seq(
      (1L, Array(0.3f, 0.4f)),  // norm 0.5 -> 500000, band 5
      (2L, Array(1.0f, 0.0f)),  // norm 1.0 -> 1000000, band 10
      (3L, Array(0.0f, 0.0f))   // zero vector -> band 0
    ).toDF("vec_id", "embedding")
    val got = NormHistogram.histogram(emb)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(5L) == ((5L, 1L, 500000L, 500000L)))
    assert(got(10L) == ((10L, 1L, 1000000L, 1000000L)))
    assert(got(0L) == ((0L, 1L, 0L, 0L)))
  }

  test("the histogram conserves vectors on the corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val hist = NormHistogram.histogram(emb)
      .as[(Long, Long, Long, Long)].collect()
    assert(hist.map(_._2).sum == emb.count())
    hist.foreach { case (b, _, lo, hi) =>
      assert(lo >= b * NormHistogram.BandMicros &&
        hi < (b + 1) * NormHistogram.BandMicros, s"band $b")
    }
  }
}
