package graft.operators

import graft.SparkSpec

/** Composite semantics: the chrome-collapse case raw-text dedup misses,
  * stage agreement with the standalone operators, and the budget bound.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("pages differing only in boilerplate collapse to one survivor") {
    // chrome carried by THREE docs (df >= MinDocs -> struck); the shared
    // body by only TWO (df 2 < 3 -> its grams survive). After the strip,
    // docs 1 and 2 are byte-identical and dedup to one survivor — the
    // collapse raw-text dedup misses (their RAW strings differ).
    val chrome = "follow us on social media now"
    val body = "the quick brown fox jumps over the lazy dog and the dog sleeps " +
      "under the old tree and the fox runs off into the woods of the north " +
      "and the day ends quietly as the sun sets over the hills of the valley"
    val body3 = "an entirely different but still quite long english document about " +
      "the sea and the ships and the storms of the coast and the sailors " +
      "who cross the water in the season of the long calm days"
    val docs = Seq(
      (1L, s"$body $chrome", "en", "a"), // same body, chrome at the end
      (2L, s"$chrome $body", "en", "a"), // ... at the front
      (3L, s"$chrome $body3", "en", "b") // third chrome carrier, unique body
    ).toDF("doc_id", "text", "lang", "source")
    val kept = Curate.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L),
      s"chrome-only variants did not collapse: $kept")
    assert(kept.contains(3L), s"unique-body carrier dropped: $kept")
  }

  test("the composite equals its stages composed by hand on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Curate.curate(docs).collect().map(_.toSeq).toSet
    import org.apache.spark.sql.functions._
    val stripped = Boilerplate.strip(docs)
      .select(col("doc_id"), col("text_stripped").as("text"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
    val manual = BudgetSample.samplePreTokenized(
      CleanCorpus.cleanUnordered(stripped)
        .select(col("doc_id"), col("source"), col("n_tokens")))
      .collect().map(_.toSeq).toSet
    assert(got == manual)
    assert(got.nonEmpty)
    // budget bound per source
    val bySrc = Curate.curate(docs).as[(Long, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._3).sum)
    bySrc.foreach { case (s, tok) =>
      assert(tok <= BudgetSample.BudgetTokens, s"$s over budget")
    }
  }
}
