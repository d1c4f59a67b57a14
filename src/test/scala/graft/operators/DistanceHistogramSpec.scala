package graft.operators

import graft.SparkSpec

/** Distance-histogram semantics: bin arithmetic on known cosines, and a
  * conservation check against the candidate-pair machinery it describes.
  */
class DistanceHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def vec(a: Double, b: Double): Array[Float] =
    (Array(a, b) ++ Array.fill(Similarity.Dim - 2)(0.0)).map(_.toFloat)

  test("known cosines land in their floor bins") {
    // colinear positive multiples share every sign bucket by construction
    // (identical sign pattern in all tables): cos = 1.0 exactly for all 3
    // pairs -> bin 20; the antipode never co-buckets -> contributes nothing
    val emb = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(2.0, 0.0)), (3L, vec(3.0, 0.0)),
      (4L, vec(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = DistanceHistogram.histogram(emb)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(20L -> 3L))
  }

  test("corpus histogram conserves the candidate-pair count") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val rows = DistanceHistogram.histogramEmbeddings(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= -DistanceHistogram.BinsPerUnit &&
      r._1 <= DistanceHistogram.BinsPerUnit))
    assert(rows.forall(r => r._2 == r._1 * 5))
    val pairTotal = Dedup.lshCandidatePairs(emb, Dedup.NearDupTables).count()
    assert(rows.map(_._3).sum == pairTotal)
  }
}
