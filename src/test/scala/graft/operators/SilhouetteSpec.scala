package graft.operators

import graft.SparkSpec

/** Silhouette-report semantics: exact a2/b2 on constructed clusters, the
  * reassignment count, and reconciliation with the outlier screen's
  * own-centroid distances.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("a2/b2 and the violation count are exact on constructed clusters") {
    // label 0 at x=0, label 1 at x=1 (tight), one label-0 straggler at
    // x=0.75 (exact in binary) that sits closer to centroid 1.
    val rows = Seq(
      (0L, Array(0.0f), 0), (1L, Array(0.0f), 0), (2L, Array(0.75f), 0),
      (3L, Array(1.0f), 1), (4L, Array(1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Silhouette.cohesion(rows)
      .as[(Int, Long, Long, Long, Long)].collect()
    // centroid 0 = floor(750/3) = 250 milli; centroid 1 = 1000
    // a2 label0: (250² + 250² + 500²) div 3 = 125000; label1 = 0
    // b2 label0 vs c1: (1000² + 1000² + 250²) div 3 = 687500;
    // label1 vs c0: 750² = 562500; straggler vec 2 is the one violation
    assert(got.toSeq == Seq(
      (0, 3L, 125000L, 687500L, 1L),
      (1, 2L, 0L, 562500L, 0L)))
  }

  test("own-centroid distances reconcile with emb_outliers' top entry") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val rep = Silhouette.cohesion(emb)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rep.length == 10 && rep.map(_._2).sum == 500)
    // the worst outlier's own-label mean must be <= the outlier's own d2
    val top = Similarity.labelOutliers(emb, 1)
      .as[(Long, Int, Long)].head()
    val meanOwn = rep.find(_._1 == top._2).get._3
    assert(meanOwn <= top._3)
  }
}
