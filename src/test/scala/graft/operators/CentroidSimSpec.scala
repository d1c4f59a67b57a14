package graft.operators

import graft.SparkSpec

/** Centroid-cosine semantics on constructed geometry: colinear, opposite,
  * orthogonal, and 45-degree centroids, plus the offset-shifted integer
  * mean on a negative non-exact division.
  */
class CentroidSimSpec extends SparkSpec {
  import spark.implicits._

  private def v(a: Double, b: Double): Array[Float] =
    Array(a.toFloat, b.toFloat)

  // label 0: centroid (1e6, 0); 1: (0, 1e6); 2: (-1e6, 0);
  // 3: (5e5, 5e5); 4: sum (-1e6, 0) over n=3 -> c = floor(-1e6/3) = -333334
  private def emb = Seq(
    (1L, v(1, 0), 0), (2L, v(1, 0), 0),
    (3L, v(0, 1), 1), (4L, v(0, 1), 1),
    (5L, v(-1, 0), 2), (6L, v(-1, 0), 2),
    (7L, v(0.5, 0.5), 3),
    (8L, v(-0.5, 0), 4), (9L, v(-0.5, 0), 4), (10L, v(0, 0), 4)
  ).toDF("vec_id", "embedding", "label")

  test("pairwise centroid cosines are exact on constructed geometry") {
    val got = CentroidSim.matrix(emb)
      .as[(Int, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 10) // C(5,2), every unordered pair once, a < b
    assert(got((0, 1))._5 == 0L)        // orthogonal
    assert(got((0, 2))._5 == -1000000L) // opposite
    assert(got((0, 3))._5 == 707106L)   // 45 degrees: floor(cos * 1e6)
    assert(got((2, 3))._5 == -707107L)  // 135 degrees: floor rounds DOWN
    // label 4's centroid is the shifted div: floor(-1e6/3) = -333334,
    // exactly antiparallel to label 0 and parallel to label 2
    assert(got((2, 4))._5 == 1000000L)
    assert(got((0, 4))._5 == -1000000L)
    // vector counts ride along
    assert(got((0, 4))._3 == 2L && got((0, 4))._4 == 3L)
  }

  test("the driver query emits the full label-pair matrix") {
    val rows = CentroidSim.matrixEmbeddings(spark, sf0001)
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(rows.length == 45) // C(10,2)
    assert(rows.forall(r => r._1 < r._2))
    assert(rows.forall(r => r._5 >= -1000000L && r._5 <= 1000000L))
  }
}
