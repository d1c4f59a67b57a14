package graft.operators

import graft.SparkSpec

/** Semantics pins for [[DedupAttribution]]: each duplicate regime lands in
  * exactly the stages that can catch it, and the cascade priority picks
  * the cheapest one. Ids avoid the %250 probe residues so the synthetic
  * corpus controls every group.
  */
class DedupAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("each regime is attributed to its catching stages and first stage") {
    val textA = (0 until 30).map(i => s"a$i").mkString(" ")
    val textAEdit = ((0 until 29).map(i => s"a$i") :+ "zz").mkString(" ")
    val textB = (0 until 30).map(i => s"b$i").mkString(" ")
    val shoutedB = textB.toUpperCase + " !!!"
    val corpus = docs(
      10L -> textA, 11L -> textA, // byte-exact copy
      20L -> textA.replace("a", "c"), 21L -> (textA.replace("a", "c")
        .split(" ").dropRight(1) :+ "zz").mkString(" "), // token edit
      30L -> textB, 31L -> shoutedB) // canonical-form variant
    val got = DedupAttribution.attribution(corpus)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // 11: exact copy — caught by ALL three screens, first stage 'exact'
    // (identical bytes => identical canonical form and identical shingles)
    assert(got.contains((11L, 1L, 1L, 1L, "exact")))
    // 21: one-token edit — only the near-dup screen sees it
    assert(got.contains((21L, 0L, 0L, 1L, "near_dup")))
    // 31: shouted + punctuation — canonical form matches, bytes and
    // (case-sensitive) shingles do not
    assert(got.contains((31L, 0L, 1L, 0L, "normalized")))
    // keepers and doc_a sides are never flagged
    assert(got.map(_._1).intersect(Set(10L, 20L, 30L)).isEmpty)
  }
}
