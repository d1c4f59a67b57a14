package graft.operators

import graft.SparkSpec

/** Confusion-matrix semantics: row normalization, cell totals, and
  * agreement with the certified per-document predictions.
  */
class LangIdEvalSpec extends SparkSpec {
  import spark.implicits._

  test("cells reconcile with text_langid's per-document predictions") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val perDoc = TextAnalysis.langId(docs)
      .groupBy("lang_labeled", "lang_pred").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val cells = LangIdEval.confusion(docs)
      .as[(String, String, Long, Long)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (l, p, n, _) => assert(perDoc((l, p)) == n) }
    assert(cells.map(_._3).sum == docs.count())
  }

  test("row ppm sums to ~1e6 per labeled language") {
    val cells = LangIdEval.confusionDocuments(spark, sf0001)
      .as[(String, String, Long, Long)].collect()
    cells.groupBy(_._1).foreach { case (lang, rows) =>
      val s = rows.map(_._4).sum
      // each cell floors, so the row sum undershoots by < |cells| ppm
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$lang row ppm sum $s")
    }
  }
}
