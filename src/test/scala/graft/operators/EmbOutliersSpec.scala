package graft.operators

import graft.SparkSpec

/** Farthest-from-own-label-centroid outlier screen (Similarity.labelOutliers). */
class EmbOutliersSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's integer math, re-derived sequentially. */
  private def model(rows: Seq[(Long, Seq[Float], Int)], k: Int): List[(Long, Int, Long)] = {
    val milli = rows.map { case (id, v, l) =>
      (id, l, v.map(x => math.floor(x.toDouble * 1e3).toLong))
    }
    val cents = milli.groupBy(_._2).map { case (l, g) =>
      val dim = g.head._3.length
      l -> (0 until dim).map(d =>
        math.floor(g.map(_._3(d)).sum.toDouble / g.length).toLong)
    }
    milli.map { case (id, l, v) =>
      (id, l, v.zip(cents(l)).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(r => (-r._3, r._1)).take(k).toList
  }

  test("a planted far vector ranks first with the hand-computed distance") {
    val rows: Seq[(Long, Seq[Float], Int)] =
      (1 to 5).map(i => (i.toLong, Seq(1.0f, 0.0f), 0)) ++
        Seq((6L, Seq(5.0f, 5.0f), 0)) ++
        (7 to 9).map(i => (i.toLong, Seq(0.0f, 1.0f), 1))
    val got = Similarity.labelOutliers(
      rows.toDF("vec_id", "embedding", "label"), k = 3)
      .as[(Long, Int, Long)].collect().toList
    assert(got == model(rows, 3))
    assert(got.head._1 == 6L)
  }

  test("matches the sequential model on sf0.001 and is partition invariant") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val rows = emb.select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect().toSeq
    val got = Similarity.labelOutliers(emb)
      .as[(Long, Int, Long)].collect().toList
    val gotShuffled = Similarity.labelOutliers(emb.repartition(7))
      .as[(Long, Int, Long)].collect().toList
    assert(got == model(rows, Similarity.OutlierTopK))
    assert(got == gotShuffled && got.length == Similarity.OutlierTopK)
  }
}
