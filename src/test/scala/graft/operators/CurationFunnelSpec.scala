package graft.operators

import graft.SparkSpec

/** Funnel semantics: stage monotonicity, agreement with the clean chain's
  * actual output, and winner-source attribution for cross-source dupes.
  */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("stages are monotone and the dedup stage equals the clean chain's output") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val f = CurationFunnel.funnel(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(f.length == 20)
    f.foreach { case (s, raw, lang, qual, uniq, toks) =>
      assert(raw >= lang && lang >= qual && qual >= uniq, s"$s not monotone")
      assert(uniq == 0 || toks > 0, s"$s has winners but no tokens")
    }
    val cleaned = CleanCorpus.cleanUnordered(docs)
    assert(f.map(_._5).sum == cleaned.count(), "n_unique != clean chain rows")
    assert(f.map(_._4).sum == CleanCorpus.gatedDocs(docs).count(),
      "n_quality != gated rows")
  }

  test("a cross-source duplicate group counts once, under its winner's source") {
    // same text in sources a (doc 1) and b (doc 2): winner doc 1 -> source a.
    // the text passes the en gates (copied from the clean-chain spec corpus
    // style: English stopwords + alpha).
    val good = "the quick brown fox jumps over the lazy dog and it is very good"
    val docs = Seq(
      (1L, good, "en", "a"),
      (2L, good, "en", "b"),
      (3L, good + " indeed", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val f = CurationFunnel.funnel(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(f("a")._5 == 1, "winner not attributed to source a")
    assert(f("b")._2 == 2 && f("b")._5 == 1,
      "duplicate loser counted as a unique winner in source b")
  }
}
