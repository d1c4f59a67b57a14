package graft.operators

import graft.SparkSpec

/** BPE pair-count semantics: corpus-frequency weighting (pair work rides
  * the distinct-word table but counts every occurrence), overlapping pairs
  * within a word, and the deterministic merge-candidate order.
  */
class BpePairsSpec extends SparkSpec {
  import spark.implicits._

  test("pair frequencies weight by word occurrences, pairs overlap within a word") {
    // "aaa" has pairs aa, aa (overlapping); appears 3x -> aa freq 6
    // "ab ab" adds ab freq 2
    val docs = Seq((1L, "aaa aaa ab"), (2L, "aaa ab")).toDF("doc_id", "text")
    val got = BpePairs.mergeCandidates(docs).as[(String, Long)].collect().toMap
    assert(got("aa") == 6L)
    assert(got("ab") == 2L)
  }

  test("the candidate order is a total order: freq desc, then pair asc") {
    val docs = Seq((1L, "xy yz xy yz zz")).toDF("doc_id", "text")
    val got = BpePairs.mergeCandidates(docs).as[(String, Long)].collect().toSeq
    assert(got == Seq(("xy", 2L), ("yz", 2L), ("zz", 1L)))
  }

  test("single-char words carry no pairs; the corpus run is non-vacuous") {
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(BpePairs.mergeCandidates(tiny).count() == 0L)
    val out = BpePairs.mergeCandidatesDocuments(spark, sf0001)
      .as[(String, Long)].collect()
    assert(out.length == BpePairs.TopPairs)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.reverse.toSeq,
      "candidates not in descending frequency order")
  }
}
