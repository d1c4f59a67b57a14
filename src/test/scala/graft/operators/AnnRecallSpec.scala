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

  test("the trained coarse codebook does not degrade IVF recall") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val init = (pairs(Similarity.ivfTopK(emb)) & exact).size.toDouble / exact.size
    val trained = (pairs(Similarity.ivfTopK(emb, trained = true)) & exact)
      .size.toDouble / exact.size
    info(f"ivf recall: init = $init%.3f, trained coarse = $trained%.3f")
    // one Lloyd step re-centers lists; recall must stay useful and not
    // collapse relative to the init codebook
    assert(trained >= 0.5, f"trained-coarse IVF degenerated: $trained%.3f")
    assert(trained >= init - 0.15, f"training regressed recall: $init%.3f -> $trained%.3f")
  }

  test("PQ/ADC recovers a meaningful fraction of the exact L2 top-k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // exact L2 ground truth — PQ approximates L2 distance, not cosine, so
    // the baseline must rank by the same metric
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"d", $"vec_id")
    def exactTop(n: Int): Set[(Long, Long)] = pairs(emb.as("c")
      .join(broadcast(queries), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("vec_id"),
        graft.functions.VectorFunctions.sqDist($"qv", $"c.embedding").as("d"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= n))
    val exact5 = exactTop(5)
    val exact20 = exactTop(20)
    assert(exact5.nonEmpty)
    val pq = pairs(ProductQuantization.adcTopK(emb))
    val pqTrained = pairs(ProductQuantization.adcTopKTrained(emb))
    val ivfPq = pairs(ProductQuantization.ivfPqTopK(emb))
    val ivfPqRes = pairs(ProductQuantization.ivfPqResidualTopK(emb))
    val ivfPqResTr = pairs(ProductQuantization.ivfPqResidualTopK(emb, trained = true))
    // recall@5 is data-limited here (500 near-equidistant 64-d points:
    // distance concentration makes the exact rank order noise-sensitive, so
    // quantization reshuffles the boundary regardless of codebook
    // resolution — measured identical at 8x8-dim and 16x4-dim); the
    // standard PQ figure is the larger-horizon recall: the returned top-5
    // must be GOOD neighbors (within the exact top-20)
    val r5pq = (pq & exact5).size.toDouble / exact5.size
    val r5ivf = (ivfPq & exact5).size.toDouble / exact5.size
    val r20pq = (pq & exact20).size.toDouble / pq.size
    val r20ivf = (ivfPq & exact20).size.toDouble / ivfPq.size
    val r5res = (ivfPqRes & exact5).size.toDouble / exact5.size
    val r20res = (ivfPqRes & exact20).size.toDouble / ivfPqRes.size
    val r5resTr = (ivfPqResTr & exact5).size.toDouble / exact5.size
    val r20resTr = (ivfPqResTr & exact20).size.toDouble / ivfPqResTr.size
    val r5tr = (pqTrained & exact5).size.toDouble / exact5.size
    val r20tr = (pqTrained & exact20).size.toDouble / pqTrained.size
    info(f"pq recall@5 = $r5pq%.3f (top-5-in-top-20 = $r20pq%.3f), " +
      f"pq-trained recall@5 = $r5tr%.3f (top-5-in-top-20 = $r20tr%.3f), " +
      f"ivf+pq recall@5 = $r5ivf%.3f (top-5-in-top-20 = $r20ivf%.3f), " +
      f"ivf+pq+res recall@5 = $r5res%.3f (top-5-in-top-20 = $r20res%.3f), " +
      f"ivf+pq+res-trained recall@5 = $r5resTr%.3f (top-5-in-top-20 = $r20resTr%.3f)")
    // one Lloyd step must not make the codebook worse than init
    assert(r5tr >= r5pq - 0.05, f"training regressed recall: $r5tr%.3f < $r5pq%.3f")
    assert(r20tr >= 0.5, f"trained top-5 are not good neighbors: $r20tr%.3f")
    assert(r5pq >= 0.15, f"PQ recall@5 degenerated: $r5pq%.3f")
    assert(r5ivf >= 0.15, f"IVF+PQ recall@5 degenerated: $r5ivf%.3f")
    assert(r20pq >= 0.5, f"PQ top-5 are not good neighbors: $r20pq%.3f")
    assert(r20ivf >= 0.5, f"IVF+PQ top-5 are not good neighbors: $r20ivf%.3f")
    // measured finding, pinned: with DETERMINISTIC (untrained) codebooks,
    // residual codes LOSE to absolute codes (0.150/0.550 vs 0.325/0.775) —
    // absolute codewords are actual data points covering the manifold;
    // "first-K residuals" do not cover the residual distribution. Classic
    // residual IVF-PQ earns its keep only with k-means-trained codebooks
    // (the kmeansStep path). Floors keep the operator honest, not heroic.
    assert(r5res >= 0.10, f"residual recall@5 collapsed: $r5res%.3f")
    assert(r20res >= 0.4, f"residual top-5 are not good neighbors: $r20res%.3f")
    // the claim the untrained caveat makes, now MEASURED: one Lloyd step
    // over the residual distribution lifts recall@5 0.150 -> 0.325 (and
    // top-5-in-top-20 0.550 -> 0.700) — the trained-residual configuration
    // matches the absolute-code path's 0.325, i.e. residual coding stops
    // losing exactly when the codebook is trained. Floors sit below the
    // measured values with margin; the >= untrained pin keeps the
    // qualitative claim (training helps) from ever silently inverting.
    assert(r5resTr >= r5res, f"training made residual recall WORSE: $r5resTr%.3f < $r5res%.3f")
    assert(r5resTr >= 0.25, f"trained residual recall@5 degenerated: $r5resTr%.3f")
    assert(r20resTr >= 0.6, f"trained residual top-5 are not good neighbors: $r20resTr%.3f")
  }
  test("range search recovers the radius neighborhood the buckets can see") {
    import org.apache.spark.sql.functions._
    val emb = Dedup.probeAugmented(graft.sources.Tables.embeddings(spark, sf0001))
    // exact radius ground truth (brute force, same threshold)
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.norm(col("embedding")).as("nrm"))
    val q = withNorm.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val exact = pairs(withNorm.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("nn", col("qn") * col("nrm"))
      .filter(when(col("nn") === 0.0, lit(0.0))
        .otherwise(graft.functions.VectorFunctions.dot(col("qv"), col("embedding")) / col("nn"))
        >= Similarity.RangeThreshold))
    assert(exact.nonEmpty)
    val got = pairs(Similarity.lshRange(emb))
    // no false positives: every returned pair really is inside the radius
    assert((got -- exact).isEmpty, s"range search returned out-of-radius pairs")
    val recall = (got & exact).size.toDouble / exact.size
    info(f"range recall = $recall%.3f (${got.size} of ${exact.size})")
    assert(recall >= 0.5, f"range recall degenerated: $recall%.3f")
  }
}
