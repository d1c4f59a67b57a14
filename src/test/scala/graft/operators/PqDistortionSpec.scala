package graft.operators

import graft.SparkSpec

/** Distortion-report semantics: per-subspace totality, the
  * codeword-self-distance zero, and mean ≤ max.
  */
class PqDistortionSpec extends SparkSpec {
  import spark.implicits._

  test("the report covers every subspace over the whole corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val got = PqDistortion.reportEmbeddings(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (0L until ProductQuantization.NumSub))
    got.foreach { r =>
      assert(r._2 == n && r._3 >= 0 && r._3 <= r._4)
    }
  }

  test("codebook vectors quantize to themselves with zero error") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("vec_id") <
        ProductQuantization.NumCodes)
    // a corpus consisting only of the codewords has zero distortion
    val got = PqDistortion.report(emb)
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { r => assert(r._3 == 0L && r._4 == 0L) }
  }
}
