package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV pairwise overlap: exactness below saturation, estimator sanity
  * above it, and the union-sample invariants.
  */
class KmvOverlapSpec extends SparkSpec {
  import spark.implicits._

  /** Distinct (event_type, hv) sets built through the production hash. */
  private def hashes(sets: (String, Seq[Long])*) = {
    val rows = sets.flatMap { case (g, vs) => vs.distinct.map(v => (g, v)) }
    Sketches.kmvOverlapOf(
      rows.toDF("event_type", "v")
        .select($"event_type", Sketches.kmvHashOf($"v").as("hv")).distinct())
  }

  private def row(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
    df.filter($"type_a" === a && $"type_b" === b)
      .select($"n_kept", $"n_common", $"est_jaccard", $"est_intersection")
      .as[(Long, Long, Double, Double)].head()

  test("below saturation the jaccard and intersection are EXACT") {
    // |A| = 30, |B| = 30, |A ∩ B| = 10, |A ∪ B| = 50 < k = 64
    val df = hashes("a" -> (0L until 30L), "b" -> (20L until 50L))
    val (nKept, nCommon, j, inter) = row(df, "a", "b")
    assert(nKept == 50L && nCommon == 10L, (nKept, nCommon))
    assert(j == math.BigDecimal(10.0 / 50.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, j)
    assert(inter == 10.0, inter)
  }

  test("disjoint sets report zero overlap; identical sets report jaccard 1") {
    val df = hashes("a" -> (0L until 40L), "b" -> (1000L until 1040L),
      "c" -> (0L until 40L))
    assert(row(df, "a", "b")._3 == 0.0)
    val (_, _, j, inter) = row(df, "a", "c")
    assert(j == 1.0 && inter == 40.0, (j, inter))
  }

  test("above saturation: k-bounded sample, estimates within the error band") {
    // |A| = |B| = 600, overlap 300 -> true J = 1/3, union = 900 >> k
    val df = hashes("a" -> (0L until 600L), "b" -> (300L until 900L))
    val (nKept, nCommon, j, inter) = row(df, "a", "b")
    assert(nKept == Sketches.KmvK.toLong, nKept)
    assert(nCommon <= nKept)
    // binomial std err at k=64 ~ 6%; allow 3 sigma
    assert(math.abs(j - 1.0 / 3.0) < 0.18, j)
    assert(math.abs(inter - 300.0) / 300.0 < 0.55, inter)
  }

  test("every unordered pair appears exactly once, ordered a < b") {
    val df = hashes("a" -> Seq(1L), "b" -> Seq(2L), "c" -> Seq(3L))
    val pairs = df.select($"type_a", $"type_b").as[(String, String)].collect()
    assert(pairs.toSet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(pairs.forall { case (x, y) => x < y })
  }
}
