package graft.operators

import graft.SparkSpec

/** Bigram surprisal semantics: repeated transitions score zero, novel
  * transitions among common words score high (the signal unigram
  * surprisal cannot see), and token-less docs report 0/0.
  */
class BigramSurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("a corpus-unique transition outscores a repeated one at equal unigram mix") {
    // docs 1-3 repeat the a->b->c cycle; doc 4 uses the same WORDS with
    // reversed (corpus-rare) transitions
    val docs = Seq(
      (1L, "a b c a b c"), (2L, "a b c a b c"), (3L, "a b c a b c"),
      (4L, "c b a c b a")
    ).toDF("doc_id", "text")
    val got = BigramSurprisal.score(docs).orderBy($"doc_id")
      .as[(Long, Long, Long)].collect()
    val perBigram = got.map(r => r._1 -> r._3.toDouble / r._2).toMap
    assert(perBigram(4L) > perBigram(1L),
      s"novel transitions did not outscore repeated ones: $perBigram")
    assert(got.forall(_._3 >= 0))
  }

  test("a single-transition corpus scores exactly zero (ln 1 per pair)") {
    val docs = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val got = BigramSurprisal.score(docs).as[(Long, Long, Long)].collect()
    assert(got.forall(r => r._2 == 1L && r._3 == 0L))
  }

  test("sub-bigram docs report 0/0; corpus run is non-vacuous") {
    val tiny = Seq((1L, "word"), (2L, "")).toDF("doc_id", "text")
    val t = BigramSurprisal.score(tiny).as[(Long, Long, Long)].collect()
    assert(t.forall(r => r._2 == 0L && r._3 == 0L))
    val out = BigramSurprisal.scoreDocuments(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(out.count(_._3 > 0) > 400, "corpus bigram scores mostly zero — vacuous")
  }
}
