package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** One Lloyd step on planted clusters: members follow their cosine-nearest
  * centroid, the update is the exact member mean, and the result is
  * independent of input partitioning (the scaled-integer-sum property).
  */
class KmeansStepSpec extends SparkSpec {
  import spark.implicits._

  private def axis(d: Int, scale: Float): Array[Float] =
    Array.tabulate(Similarity.Dim)(i => if (i == d) scale else 0f)

  private def emb(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("members join their nearest centroid; update is the exact member mean") {
    val df = emb(
      0L -> axis(0, 1f), 1L -> axis(1, 1f), // the two codebook centroids
      2L -> axis(0, 2f), 3L -> axis(0, 0.5f), // cosine-1 with centroid 0
      4L -> axis(1, 3f)) // cosine-1 with centroid 1
    val out = Similarity.kmeansStep(df, nCentroids = 2)
      .select($"cid", $"pos", $"n_members", $"centroid_micro")
      .as[(Long, Long, Long, Long)].collect()
    val byKey = out.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byKey((0L, 0L)) == ((3L, 1166666L))) // floor((1 + 2 + 0.5)e6 / 3)
    assert(byKey((1L, 1L)) == ((2L, 2000000L))) // (1 + 3) / 2 in micro-units
    assert(byKey((0L, 1L)) == ((3L, 0L))) // off-axis dims stay zero
    assert(out.length == 2 * Similarity.Dim) // both centroids, every dim
  }

  test("result is invariant to input partitioning") {
    val rows = (0L until 40L).map(i =>
      i -> Array.tabulate(Similarity.Dim)(d =>
        (Similarity.planeWeight(i.toInt, d) * 3).toFloat))
    val a = Similarity.kmeansStep(emb(rows: _*), nCentroids = 4)
      .orderBy($"cid", $"pos").collect().toSeq
    val b = Similarity.kmeansStep(emb(rows: _*).repartition(7), nCentroids = 4)
      .orderBy($"cid", $"pos").collect().toSeq
    assert(a == b)
  }
}
