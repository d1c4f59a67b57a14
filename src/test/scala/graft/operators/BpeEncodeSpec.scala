package graft.operators

import graft.SparkSpec

/** BPE apply semantics: sequential merge application in priority order,
  * left-to-right non-overlapping replacement, the (freq DESC, pair ASC)
  * tie-break, and the integer fertility arithmetic.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def vocab(docs: Seq[(Long, String, String)]) =
    BpeEncode.encodedVocab(docs.toDF("doc_id", "source", "text"))
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("merges apply sequentially, left-to-right, non-overlapping") {
    // pairs: aa freq 4 (2 overlapping per "aaa" occurrence x 2), ab freq 1
    // -> merges = [aa, ab]
    val got = vocab(Seq((1L, "s", "aaa aaa ab")))
    // "a a a" -> leftmost "a a" merges, remainder cannot re-overlap
    assert(got("aaa") == ((2L, "aa a", 2L)))
    // the aa merge does not touch "a b"; the ab merge then lands
    assert(got("ab") == ((1L, "ab", 1L)))
  }

  test("equal-frequency merges order by pair asc (xx before xy)") {
    // xx and xy both freq 2 -> xx merges first, so "xxy" becomes [xx, y]
    // (xy-first would give [x, xy])
    val got = vocab(Seq((1L, "s", "xx xy xxy")))
    assert(got("xxy")._2 == "xx y")
    assert(got("xxy")._3 == 2L)
  }

  test("fertility is exact integer ppm per source") {
    // source s1: ab ab cd -> 3 words, 6 chars, all single-token -> 500000
    // source s2: ab -> 1 word, 2 chars, 1 token -> 500000
    val docs = Seq((1L, "s1", "ab ab cd"), (2L, "s2", "ab"))
      .toDF("doc_id", "source", "text")
    val got = BpeEncode.fertility(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 3L, 6L, 3L, 500000L), ("s2", 1L, 2L, 1L, 500000L)))
  }

  test("the corpus run is non-vacuous and merges actually shrink tokens") {
    val out = BpeEncode.encodeDocuments(spark, sf0001)
      .as[(String, Long, String, Long)].collect()
    assert(out.nonEmpty)
    // every word: 1 <= n_tokens <= chars, and at least one word compressed
    assert(out.forall(r => r._4 >= 1L && r._4 <= r._1.length))
    assert(out.exists(r => r._4 < r._1.length), "no merge ever applied")
  }
}
