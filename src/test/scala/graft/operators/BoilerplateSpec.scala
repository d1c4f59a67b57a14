package graft.operators

import graft.SparkSpec

/** Boilerplate strip semantics on hand-built corpora (the oracle certifies
  * the corpus run; this pins the editing behavior cases explicitly).
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val chrome = "follow us on social media now" // 6 tokens, 2 grams

  test("grams shared by >= MinDocs docs are struck everywhere, order preserved") {
    val docs = Seq(
      (1L, s"alpha beta $chrome gamma delta"),
      (2L, s"$chrome something else entirely here"),
      (3L, s"one two three four five six $chrome"),
      (4L, "unique content with no shared windows at all")
    ).toDF("doc_id", "text")
    val out = Boilerplate.strip(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    // the 6-token chrome carries 2 overlapping 5-grams, each in 3 docs;
    // their union covers all 6 chrome tokens in every carrier
    assert(out(0) == ((1L, 4L, 6L, "alpha beta gamma delta")))
    assert(out(1) == ((2L, 4L, 6L, "something else entirely here")))
    assert(out(2) == ((3L, 6L, 6L, "one two three four five six")))
    assert(out(3)._2 == 8L && out(3)._3 == 0L) // untouched doc keeps all
  }

  test("a fully-boilerplate doc strips to the empty string; short docs pass whole") {
    val docs = Seq(
      (1L, chrome), (2L, chrome), (3L, chrome),
      (4L, "tiny doc") // 2 tokens < Gram: cannot carry a window
    ).toDF("doc_id", "text")
    val out = Boilerplate.strip(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    (0 to 2).foreach { i =>
      assert(out(i)._2 == 0L && out(i)._4 == "", s"doc ${i + 1} not fully struck")
    }
    assert(out(3) == ((4L, 2L, 0L, "tiny doc")))
  }

  test("the corpus run is non-vacuous and conserves token counts") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val out = Boilerplate.strip(docs)
    val stripped = out.filter($"n_stripped" > 0).count()
    info(s"$stripped of ${out.count()} docs had boilerplate struck")
    assert(stripped > 0, "no doc stripped — vacuous at sf0.001")
    import org.apache.spark.sql.functions._
    val bad = out.join(docs, Seq("doc_id"))
      .filter($"n_kept" + $"n_stripped" =!=
        size(graft.functions.TextFunctions.tokens($"text")))
      .count()
    assert(bad == 0, s"$bad docs do not conserve kept + stripped = total")
  }
}
