package graft.operators

import graft.SparkSpec

/** kNN vote semantics: the neighbor set is the certified top-k contract
  * (self excluded), votes are integer counts, and prediction ties break
  * toward the smallest label.
  */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("majority vote wins; the query never votes for itself") {
    val e = emb(
      (0L, Array(1f, 0f), 5),
      // two label-5 neighbors hug q0, one label-7 further out
      (2L, Array(1f, 0.01f), 5), (3L, Array(1f, -0.01f), 5),
      (4L, Array(0.9f, 0.5f), 7),
      (5L, Array(0.1f, 1f), 9))
    val got = KnnClassify.classify(e, queryMaxId = 1L, k = 3)
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    // top-3 of q0: ids 2, 3 (label 5) and 4 (label 7) -> pred 5, hit
    assert(got == Seq((0L, 5, 5, 2L, 1L)))
  }

  test("vote ties break toward the smallest label") {
    val e = emb(
      (0L, Array(0f, 1f), 2),
      // three neighbors with distinct labels -> all 1 vote each
      (2L, Array(0.1f, 1f), 9), (3L, Array(0.9f, 0.5f), 7),
      (4L, Array(1f, 0.01f), 5))
    val got = KnnClassify.classify(e, queryMaxId = 1L, k = 3)
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2, 5, 1L, 0L)))
  }

  test("the corpus run classifies every query slice row exactly once") {
    val out = KnnClassify.classifyEmbeddings(spark, sf0001)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(out.length == KnnClassify.QueryMax)
    assert(out.map(_._1).distinct.length == out.length)
    // votes are bounded by K and hits are 0/1
    assert(out.forall(r => r._4 >= 1L && r._4 <= KnnClassify.K))
    assert(out.forall(r => r._5 == 0L || r._5 == 1L))
  }
}
