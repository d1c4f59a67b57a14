package graft.operators

import graft.SparkSpec

/** Balance-report semantics: reconciliation with the assignment stage it
  * audits and the floored-share deficit bound.
  */
class IvfBalanceSpec extends SparkSpec {
  import spark.implicits._

  test("the report reconciles with the corpus and bounds the shares") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val got = IvfBalance.reportEmbeddings(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 16)
    assert(got.map(_._2).sum == emb.count())
    val s = got.map(_._3).sum
    assert(s <= 1000000L && s > 1000000L - got.length)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
  }
}
