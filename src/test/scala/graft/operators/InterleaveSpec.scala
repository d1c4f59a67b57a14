package graft.operators

import graft.SparkSpec

/** Interleave semantics: equal-rate rounds while sources last, gap-free
  * positions, and exhausted sources dropping out cleanly.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("rounds are equal-rate and exhaustion is clean on a skewed input") {
    // source a: 3 docs, source b: 1 doc -> schedule must be
    // round1: (a, b), round2: (a), round3: (a)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "source")
    val got = Interleave.order(docs)
      .as[(Long, Long, String, Long)].collect()
    assert(got.map(_._1).toSeq == (1L to 4L))
    assert(got.map(r => (r._3, r._4)).toSeq ==
      Seq(("a", 1L), ("b", 1L), ("a", 2L), ("a", 3L)))
  }

  test("the driver schedule is a gap-free permutation of the corpus") {
    val df = Interleave.orderDocuments(spark, sf0001)
      .as[(Long, Long, String, Long)].collect()
    assert(df.length == 500)
    assert(df.map(_._1).toSeq == (1L to 500L))
    assert(df.map(_._2).distinct.length == 500)
    // all 20 sources appear in round 1, in source order
    assert(df.take(20).map(_._3).toSeq == df.take(20).map(_._3).sorted.toSeq)
    assert(df.take(20).forall(_._4 == 1L))
  }
}
