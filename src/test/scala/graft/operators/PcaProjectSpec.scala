package graft.operators

import graft.SparkSpec

/** PCA-projection semantics: the sign-factored quantizer, the bounded
  * weight range, and separation of a constructed two-cluster corpus.
  */
class PcaProjectSpec extends SparkSpec {
  import spark.implicits._

  test("projection separates a constructed dominant direction") {
    // 4 vectors along +/- e0 (the dominant axis), 2 tiny ones along e1:
    // the power step's direction is e0 up to sign, so |proj| of the e0
    // vectors is large and e1 vectors' is near zero.
    val rows = Seq(
      (0L, Array(2.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(-2.0f, 0.0f), 1),
      (3L, Array(-2.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.125f), 2),
      (5L, Array(0.0f, -0.125f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = PcaProject.project(rows)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    // e0 component quantizes to +-1000 kilo-units; sv(e0 rows) = +-2000
    assert(math.abs(got(0L)) == 2000000L)
    assert(got(0L) == got(1L) && got(2L) == got(3L) && got(0L) == -got(2L))
    // the off-axis rows project to (near) zero along e0
    assert(math.abs(got(4L)) <= 125L && math.abs(got(5L)) <= 125L)
  }

  test("the driver query is total over the corpus with bounded weights") {
    val df = PcaProject.projectEmbeddings(spark, sf0001)
    val n = df.count()
    assert(n == 500)
    // |proj| <= 64 * max|v| * 1001: the documented corpus-independent bound
    val maxAbs = df.selectExpr("max(abs(proj_kilo))").as[Long].head()
    assert(maxAbs > 0 && maxAbs < 64L * 20000L * 1001L)
  }
}
