package graft.operators

import graft.SparkSpec

/** Char-class semantics: exact splits on a hand-checked input and share
  * conservation over the corpus.
  */
class CharClassSpec extends SparkSpec {
  import spark.implicits._

  test("class splits are exact on a hand-checked input") {
    // "ab 12!" -> 6 chars: 2 alpha, 2 digit, 1 space, 1 other
    val docs = Seq((1L, "ab 12!", "s")).toDF("doc_id", "text", "source")
    val got = CharClass.profile(docs)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got == (("s", 6L, 2000000L / 6, 2000000L / 6,
      1000000L / 6, 1000000L / 6)))
  }

  test("the driver profile conserves shares per source") {
    val got = CharClass.profileDocuments(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 20)
    got.foreach { r =>
      val s = r._3 + r._4 + r._5 + r._6
      assert(s <= 1000000L && s > 1000000L - 4, s"${r._1}: $s")
      assert(r._3 > 0 && r._5 > 0) // prose has letters and spaces
    }
  }
}
