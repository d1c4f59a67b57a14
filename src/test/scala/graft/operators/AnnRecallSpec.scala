package graft.operators

import graft.SparkSpec

/** Recall floors for the approximate ANN paths against the exact baseline:
  * the oracle rows prove the approximations are REPRODUCIBLE; this proves
  * they are USEFUL (a degenerate bucketing that returned almost nothing
  * would still hash-match its own oracle). Deterministic data + deterministic
  * operators => exact, stable recall values; the floors sit below them with
  * margin.
  */
class AnnRecallSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH and IVF recover a meaningful fraction of the exact top-k") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val exact = pairs(Similarity.bruteForceTopK(emb))
    assert(exact.nonEmpty)
    val lshRecall = (pairs(Similarity.lshTopK(emb)) & exact).size.toDouble / exact.size
    val ivfRecall = (pairs(Similarity.ivfTopK(emb)) & exact).size.toDouble / exact.size
    info(f"lsh recall = $lshRecall%.3f, ivf recall = $ivfRecall%.3f")
    assert(lshRecall >= 0.3, f"LSH recall degenerated: $lshRecall%.3f")
    assert(ivfRecall >= 0.5, f"IVF recall degenerated: $ivfRecall%.3f")
  }
}
