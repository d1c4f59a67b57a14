package graft.operators

import graft.SparkSpec

/** Token-entropy semantics: the once-per-distinct micro ln weighting, the
  * degenerate single-type source, and the hapax/type-token rates.
  */
class TokenEntropySpec extends SparkSpec {
  import spark.implicits._

  test("components are exact on a hand-checked input") {
    val docs = Seq(
      (1L, "a a b", "s1"),    // n=3: tf(a)=2, tf(b)=1
      (2L, "x x x x", "s2")   // n=4, one type -> entropy 0
    ).toDF("doc_id", "text", "source")
    val got = TokenEntropy.profile(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // s1: H = (2*floor(1e6*ln(3/2)) + 1*floor(1e6*ln(3))) div 3
    val h1 = (2L * math.floor(1e6 * math.log(3.0 / 2)).toLong +
      math.floor(1e6 * math.log(3.0)).toLong) / 3
    assert(got("s1") == (("s1", 3L, 2L, h1,
      2L * 1000000 / 3, 1000000L / 2)))
    // s2: single type -> ln(1) = 0, ttr 1/4, no hapax
    assert(got("s2") == (("s2", 4L, 1L, 0L, 250000L, 0L)))
  }

  test("the driver query profiles every source with positive entropy") {
    val df = TokenEntropy.profileDocuments(spark, sf0001)
    val rows = df.as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 20 && rows.map(_._1).distinct.length == 20)
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    // real prose: entropy positive, types < tokens, rates inside [0, 1e6]
    rows.foreach { r =>
      assert(r._4 > 0 && r._3 < r._2)
      assert(r._5 > 0 && r._5 < 1000000 && r._6 >= 0 && r._6 <= 1000000)
    }
  }
}
