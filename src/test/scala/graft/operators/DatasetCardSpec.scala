package graft.operators

import graft.SparkSpec

/** Dataset-card semantics: exact stats on a hand-checked corpus, and
  * reconciliation against the operators the card summarizes.
  */
class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("stats are exact on a hand-checked corpus") {
    val docs = Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, "a b c", "en", "web", 5L), // exact dup of 1
      (3L, "d e", "de", "books", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DatasetCard.card(docs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("size", "n_docs")) == 3L)
    assert(got(("size", "total_tokens")) == 8L)
    assert(got(("size", "total_chars")) == 13L)
    assert(got(("diversity", "n_sources")) == 2L)
    assert(got(("diversity", "n_langs")) == 2L)
    assert(got(("dedup", "n_distinct_texts")) == 2L)
    assert(got(("dedup", "n_dup_docs")) == 1L)
    assert(got(("split", "n_train")) + got(("split", "n_valid")) +
      got(("split", "n_test")) == 3L)
  }

  test("corpus card reconciles with the operators it summarizes") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = DatasetCard.cardDocuments(spark, sf0001)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("size", "n_docs")) == docs.count())
    // split counts match the certified split operator
    val splits = TextAnalysis.split(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(got(("split", "n_train")) == splits("train"))
    assert(got(("split", "n_valid")) == splits("valid"))
    assert(got(("split", "n_test")) == splits("test"))
    // distinct texts match the exact-dedup key count
    assert(got(("dedup", "n_distinct_texts")) == Dedup.exact(docs).count())
    assert(got(("dedup", "n_dup_docs")) ==
      got(("size", "n_docs")) - got(("dedup", "n_distinct_texts")))
  }

  test("plan: one scan, no join") {
    val plan = DatasetCard.cardDocuments(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"))
  }
}
