package graft.operators

import graft.SparkSpec

/** Co-moment semantics: exact integer sums on a hand-checked input, the
  * full i<=j pair domain, and diagonal agreement with EmbDimStats.
  */
class EmbCovarianceSpec extends SparkSpec {
  import spark.implicits._

  test("pair sums are exact on a hand-checked two-vector input") {
    def vec(a: Double, b: Double): Array[Float] =
      (Array(a, b) ++ Array.fill(Similarity.Dim - 2)(0.0)).map(_.toFloat)
    val emb = Seq((1L, vec(0.5, 0.25)), (2L, vec(-0.5, 1.0)))
      .toDF("vec_id", "embedding")
    val got = EmbCovariance.comoments(emb)
      .as[(Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // micro values: v1 = (500000, 250000), v2 = (-500000, 1000000)
    assert(got((0, 0)) == ((2L, 250000000000L + 250000000000L)))
    assert(got((0, 1)) == ((2L, 125000000000L - 500000000000L)))
    assert(got((1, 1)) == ((2L, 62500000000L + 1000000000000L)))
    // full pair domain: Dim*(Dim+1)/2 entries
    assert(got.size == Similarity.Dim * (Similarity.Dim + 1) / 2)
  }

  test("the diagonal reproduces EmbDimStats sumsq_micro bit-for-bit") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val diag = EmbCovariance.comoments(emb)
      .filter($"dim_i" === $"dim_j")
      .select($"dim_i".as("dim"), $"sum_xy_micro")
      .as[(Int, Long)].collect().toMap
    val sumsq = EmbDimStats.stats(emb)
      .select($"dim", $"sumsq_micro").as[(Int, Long)].collect().toMap
    assert(diag == sumsq)
  }
}
