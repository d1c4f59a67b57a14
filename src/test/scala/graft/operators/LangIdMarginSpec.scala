package graft.operators

import graft.SparkSpec

/** Margin semantics: ties report 0, unique winners report the integer
  * gap, und rows report 0, and the predicted label always equals the
  * certified langPredict label.
  */
class LangIdMarginSpec extends SparkSpec {
  import spark.implicits._

  test("margins: unique winner, tie, and und cases") {
    val docs = Seq(
      // 3 en markers, 1 de marker -> en with margin 2
      (1L, "the cat and the dog of der haus"),
      // 1 en, 1 de -> tie; en wins by priority, margin 0
      (2L, "the katze und hund"),
      // no markers at all -> und, margin 0
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val got = LangIdMargin.margins(docs).orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(got(0)._2 == "en" && got(0)._4 > 0, got(0).toString)
    assert(got(1)._2 == "en" && got(1)._4 == 0, got(1).toString)
    assert(got(2) == ((3L, "und", 0L, 0L)))
  }

  test("the predicted label equals text_langid's on the corpus, margins non-negative") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val m = LangIdMargin.margins(docs)
      .select($"doc_id", $"lang_pred".as("m_pred"), $"margin")
    val l = TextAnalysis.langId(docs).select($"doc_id", $"lang_pred")
    val joined = m.join(l, Seq("doc_id"))
      .as[(Long, String, Long, String)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (d, mp, margin, lp) =>
      assert(mp == lp, s"doc $d: margin op predicted $mp, langId $lp")
      assert(margin >= 0, s"doc $d negative margin")
    }
  }
}
