package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-integer power-iteration matvec (y = Aᵀ(A·x), all-ones x). */
class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  private def model(vecs: Seq[Seq[Float]]): Seq[(Long, Long)] = {
    val sv = vecs.map(_.map(x => math.floor(x.toDouble * 1e3).toLong))
    val dim = sv.head.length
    (0 until dim).map { d =>
      val y = sv.map(r => r.sum * r(d)).sum
      (d.toLong, y)
    }
  }

  test("matches the sequential model exactly on the sf0.001 embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val got = Similarity.powerIterationStep(emb)
      .as[(Long, Long)].collect().toList
    val vecs = emb.select($"embedding").as[Seq[Float]].collect().toSeq
    assert(got == model(vecs).toList && got.length == 64)
  }

  test("is partition-order independent and finds the dominant axis") {
    // axis 0 carries all the variance; axis 1 is a small constant offset
    val vecs: Seq[Seq[Float]] =
      (1 to 50).flatMap(_ => Seq(Seq(1.0f, 0.1f), Seq(-1.0f, 0.1f)))
    val df = vecs.toDF("embedding")
    val got = Similarity.powerIterationStep(df)
      .as[(Long, Long)].collect().toList
    val gotShuffled = Similarity.powerIterationStep(df.repartition(7))
      .as[(Long, Long)].collect().toList
    assert(got == model(vecs).toList && got == gotShuffled)
    val y = got.map(_._2)
    assert(math.abs(y(0)) > 50 * math.abs(y(1)), y)
  }
}
