package graft.operators

import graft.SparkSpec

/** Semantics pins for [[VocabGrowth]]: hand-checked bands on a corpus
  * with one doc per band, plus the conservation laws the curve must obey
  * (final cumulatives equal the corpus totals; cumulatives monotone).
  */
class VocabGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked curve: one doc per band, known first-seen types") {
    // max_id = 7 -> band of doc d is exactly d (d * 8 div 8)
    val docs = Seq(
      0L -> "a b",       // types a, b first seen in band 0
      1L -> "b c",       // c new in band 1
      2L -> "a c",       // nothing new
      3L -> "d",         // d new
      4L -> "a b c d",   // nothing new
      5L -> "e e e",     // e new
      6L -> "a",         // nothing new
      7L -> "f b"        // f new
    ).toDF("doc_id", "text")
    val got = VocabGrowth.growth(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val expected = Seq(
      // (band, n_docs, n_tokens, new_types, docs_cum, tokens_cum, types_cum)
      (0L, 1L, 2L, 2L, 1L, 2L, 2L),
      (1L, 1L, 2L, 1L, 2L, 4L, 3L),
      (2L, 1L, 2L, 0L, 3L, 6L, 3L),
      (3L, 1L, 1L, 1L, 4L, 7L, 4L),
      (4L, 1L, 4L, 0L, 5L, 11L, 4L),
      (5L, 1L, 3L, 1L, 6L, 14L, 5L),
      (6L, 1L, 1L, 0L, 7L, 15L, 5L),
      (7L, 1L, 2L, 1L, 8L, 17L, 6L))
    assert(got == expected)
  }

  test("conservation on the corpus: final cumulatives equal the totals") {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val rows = VocabGrowth.growth(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= VocabGrowth.Bands)
    val last = rows.last
    val nDocs = docs.count()
    val nTokens = docs.select(sum(TF.nTokens(col("text")).cast("long")))
      .head().getLong(0)
    val nTypes = docs
      .select(explode(TF.tokens(col("text"))).as("t"))
      .select(countDistinct(col("t"))).head().getLong(0)
    assert(last._5 == nDocs && last._6 == nTokens && last._7 == nTypes)
    // cumulatives monotone, per-band pieces reconcile with the cumulative
    rows.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._5 == a._5 + b._2 && b._6 == a._6 + b._3 && b._7 == a._7 + b._4)
      case _ => ()
    }
  }
}
