package graft.operators

import graft.SparkSpec

/** TF-IDF top-terms on a planted corpus: rare terms outrank common ones,
  * k bounds per-doc output, ordering is total (score desc, term asc).
  */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("rare terms outrank corpus-wide terms; k caps each doc") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .select($"doc_id", $"rank", $"term", $"score")
      .as[(Long, Long, String, Double)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.forall(_._2.length <= 2))
    val rank1 = out.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    // df(apple)=1 beats df(banana)=2 beats df(common)=3
    assert(rank1 == Map(1L -> "apple", 2L -> "cherry", 3L -> "common"))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(doc1.toSeq == Seq("apple", "banana"))
    // smoothed idf floor: the everywhere-term still scores tf * 1.0
    assert(out.find(t => t._1 == 3L && t._3 == "common").get._4 == 2.0)
  }
}
