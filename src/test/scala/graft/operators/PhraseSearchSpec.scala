package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Posting-list phrase search over the TokenPositions generator. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def search(phrase: Seq[String], rows: (Long, String)*) =
    TextAnalysis.phraseSearch(rows.toDF("doc_id", "text"), phrase)
      .as[(Long, Long, Int)].collect().toList

  test("matches exact adjacent sequences only, with count and first position") {
    val got = search(Seq("quick", "brown", "fox"),
      1L -> "the quick brown fox jumps",
      2L -> "quick brown dog then quick brown fox again quick brown fox",
      3L -> "quick fox brown",         // right words, wrong order
      4L -> "quick brown",             // prefix only
      5L -> "brown fox quick")         // wrapped, not adjacent
    assert(got == List((1L, 1L, 1), (2L, 2L, 4)))
  }

  test("overlapping occurrences each count and whitespace runs do not shift positions") {
    // "b a b a b" contains "b a b" at starts 0 and 2 (overlap at position 2)
    val got = search(Seq("b", "a"),
      10L -> "b a  b   a b",
      11L -> " b a")
    assert(got == List((10L, 2L, 0), (11L, 1L, 0)))
  }

  test("agrees with a brute-force driver model on the corpus phrase") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = TextAnalysis.phraseSearch(docs)
      .as[(Long, Long, Int)].collect().toList
    val model = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val toks = text.trim.split(" +").toSeq
        val starts = toks.sliding(3).zipWithIndex.collect {
          case (w, i) if w == TextAnalysis.PhraseTerms => i
        }.toList
        if (starts.isEmpty) None else Some((id, starts.length.toLong, starts.min))
      }.sortBy(_._1).toList
    assert(got == model && got.nonEmpty)
  }

  test("repeated or too-short phrases are rejected at construction") {
    val df = Seq((1L, "a b a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.phraseSearch(df, Seq("a")))
    intercept[IllegalArgumentException](TextAnalysis.phraseSearch(df, Seq("a", "a")))
  }
}
