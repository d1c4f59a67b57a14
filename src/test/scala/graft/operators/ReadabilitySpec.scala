package graft.operators

import graft.SparkSpec

/** Readability-profile semantics: the vowel-group syllable proxy with its
  * floor, the long-word threshold, and the exact integer rates.
  */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("components are exact on a hand-checked input") {
    val docs = Seq(
      (1L, "Hello world", "a"),
      (2L, "strength xyz bcd", "a"),
      (3L, "aeiou", "b")
    ).toDF("doc_id", "text", "source")
    val got = Readability.profile(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // source a: words hello(5ch,2syll) world(5,1) strength(8,1,long)
    //           xyz(3,1: the y group) bcd(3, floor->1)
    // n_words=5, chars=24, syll=6, long=1
    assert(got("a") == (("a", 2L, 5L,
      24L * 1000 / 5, 6L * 1000 / 5, 1L * 1000000 / 5)))
    // source b: one word, 5 chars, ONE vowel group (a run, not 5)
    assert(got("b") == (("b", 1L, 1L, 5000L, 1000L, 0L)))
  }

  test("the driver query profiles every source exactly once") {
    val df = Readability.profileDocuments(spark, sf0001)
    val srcs = df.select("source").as[String].collect()
    assert(srcs.length == 20 && srcs.distinct.length == 20)
    assert(srcs.sorted.sameElements(srcs))
  }
}
