package graft.operators

import graft.SparkSpec

/** Single-row distributional skew profile (SkewReport.profile). */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  private def profileOf(keys: Seq[Long], topK: Int = 10) =
    SkewReport.profile(keys.toDF("k"), "k", topK)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head

  test("hand-computed profile of a skewed distribution") {
    // counts: key 1 -> 60, keys 2..11 -> 2 each, keys 12..21 -> 1 each
    val keys = Seq.fill(60)(1L) ++
      (2L to 11L).flatMap(k => Seq(k, k)) ++ (12L to 21L)
    val (nKeys, nRows, maxCnt, p50, p99, top2Share, skew) = profileOf(keys, topK = 2)
    assert(nKeys == 21 && nRows == 90 && maxCnt == 60)
    // ascending counts: 1 x10, 2 x10, 60; p50 index = (21-1) div 2 + 1 = 11 -> 2
    assert(p50 == 2)
    // p99 index = (20*99) div 100 + 1 = 20 -> the last 2 before the 60
    assert(p99 == 2)
    // top-2 keys by count carry 60 + 2 = 62 of 90 rows -> floor ppm
    assert(top2Share == 62L * 1000000L / 90L)
    // max/mean = 60 / (90/21) -> 60*21*1e6 div 90
    assert(skew == 60L * 21L * 1000000L / 90L)
  }

  test("uniform distribution reports ppm figures at the no-skew floor") {
    val (nKeys, nRows, maxCnt, p50, p99, top10Share, skew) =
      profileOf((1L to 20L).flatMap(k => Seq.fill(5)(k)))
    assert((nKeys, nRows, maxCnt, p50, p99) == ((20L, 100L, 5L, 5L, 5L)))
    assert(top10Share == 500000L) // 10 of 20 uniform keys = half the rows
    assert(skew == 1000000L)      // max == mean exactly
  }
}
