package graft.operators

import graft.SparkSpec

/** Semantics pins for [[Dedup.shingleDfProfile]]: decades are the house
  * integer log10, postings conserve against the inverted index, and the
  * profile prices the cap — postings above [[Dedup.MaxShingleDf]]'s
  * decade are exactly what the capped operators drop.
  */
class ShingleDfProfileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked decades and posting conservation") {
    // 11 docs sharing one shingle ("x y z"), each with one private shingle
    // (doc i also carries "p<i> q<i> r<i>")
    val docs = (0 until 11).map(i => (i.toLong, s"x y z p$i q$i r$i"))
      .toDF("doc_id", "text")
    val got = Dedup.shingleDfProfile(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // shingles per doc: "x y z", "y z p_i", "z p_i q_i", "p_i q_i r_i"
    // -> "x y z" has df 11 (decade 1); 33 private shingles have df 1
    assert(got == Seq((0L, 33L, 33L, 1L), (1L, 1L, 11L, 11L)))
    // conservation: postings sum equals the exploded index size
    val postings = got.map(_._3).sum
    import org.apache.spark.sql.functions._
    val invSize = Dedup.hashedShingleSets(docs)
      .select(explode(col("sh"))).count()
    assert(postings == invSize)
  }

  test("profile is non-vacuous on the corpus and bounded by max_df") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Dedup.shingleDfProfile(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (dec, n, postings, maxDf) =>
      assert(maxDf.toString.length - 1 == dec)
      assert(postings >= n) // every shingle carries >= 1 posting
    }
  }
}
