package graft.operators

import graft.SparkSpec

/** kNN-graph semantics: bucket-mates become directed edges ranked by
  * cosine, bucket-isolated vectors have no edges, and the corpus run is
  * bounded and non-vacuous.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private def vec(a: Double, b: Double): Array[Float] =
    (Array(a, b) ++ Array.fill(Similarity.Dim - 2)(0.0)).map(_.toFloat)

  test("co-bucketed vectors link by cosine order; the antipode is isolated") {
    // v1..v3 share every sign bucket (same orthant); v4 is the antipode of
    // v1 and lands in complement buckets in every table -> no edges
    val emb = Seq(
      (1L, vec(1.0, 0.1)), (2L, vec(1.0, 0.2)), (3L, vec(1.0, 0.3)),
      (4L, vec(-1.0, -0.1)))
      .toDF("vec_id", "embedding")
    val got = KnnGraph.graph(emb)
      .as[(Long, Long, Long, Double)].collect()
    assert(!got.exists(r => r._1 == 4L || r._3 == 4L))
    val byVec = got.groupBy(_._1)
    assert(byVec.keySet == Set(1L, 2L, 3L))
    // two candidates each (k=3 never truncates here), ranks contiguous
    byVec.values.foreach(es => assert(es.map(_._2).sorted.toSeq == Seq(1L, 2L)))
    // v1's nearest is v2 (cos ~0.9953 vs ~0.9817 to v3)
    assert(got.find(r => r._1 == 1L && r._2 == 1L).get._3 == 2L)
  }

  test("corpus run: at most K edges per vector, ranks contiguous, cos sane") {
    val got = KnnGraph.graphEmbeddings(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { es =>
      val ranks = es.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length) && ranks.length <= KnnGraph.K)
    }
    assert(got.forall(r => r._4 >= -1.000001 && r._4 <= 1.000001))
    assert(got.forall(r => r._1 != r._3), "self-edge")
  }
}
