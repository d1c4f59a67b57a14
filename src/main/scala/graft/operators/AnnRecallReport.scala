package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The ANN serve-quality dashboard as a certified QUERY: per index
  * family, how much of the exact cosine top-k the family's top-k
  * recovers (recall as exact ppm) — the number a serving team reads
  * before routing traffic to an index, produced by the same engine that
  * built the index instead of an offline eval script that can drift.
  *
  * Every family's candidate/rank stage is the certified operator
  * VERBATIM ([[Similarity.lshTopK]] / [[Similarity.lshRerankTopK]] /
  * [[Similarity.ivfTopK]] / [[Similarity.ivfRerankTopK]] /
  * [[ProductQuantization.ivfPqResRerankTopK]]) — the r16 discipline that
  * an instrument must reuse the stages it prices. The suite-level floors
  * (AnnRecallSf01Spec) pin thresholds; this query materializes the
  * measurement itself under the oracle gate.
  *
  * Scale shape: the exact baseline is ONE brute-force pass (cached — it
  * anchors every family's semi-join); each family contributes nq x k
  * rows, so everything after the index scans is dashboard-sized. The
  * semi-join against the exact pair set is a broadcast of nq x k pairs.
  *
  * Exactness: hits are integer pair-set intersections; recall_ppm is a
  * non-negative integer `div`.
  */
object AnnRecallReport {

  /** (family, hits, n_exact, recall_ppm), ordered by family.
    *
    * Trunk sharing (the r17 caching lever applied to the round's own
    * heaviest instrument): the LSH (vec_id, bk) bucket table and the IVF
    * corpus->cell assignment are each built ONCE and cached; the
    * exact-bucket/multi-probe LSH pair and the probe-4/
    * probe-6 IVF pair run over the shared trunk via the `*From` seams —
    * the stage SPELLINGS are still the certified operators' verbatim
    * (the seams are the operators' own bodies parameterized on their
    * trunk), so the dashboard remains the sum of its certified parts.
    *
    * Zero-hit visibility: a family with NO exact hits — the worst
    * possible serving outcome — must render as recall_ppm = 0, not
    * vanish (a semi-join + groupBy drops it). Hits are left-joined back
    * onto the static family list and coalesced to 0 in BOTH engines.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    // withNorm itself stays UNCACHED: it is a narrow stats-bearing parquet
    // projection, and replacing it with a stats-free RDD-cache leaf flips
    // the corpus-side equi-joins from broadcast to sort-merge in the
    // static plan (measured 21 -> 28 exchanges). The cached trunks are the
    // DERIVED frames whose recomputation is the real duplicate work: the
    // LSH bucket table and the IVF corpus->cell assignment.
    val withNorm = Similarity.withNormOf(emb)
    val buckets = Caching.cached(Similarity.lshBuckets(emb))
    // 16 = ivfTopK's default codebook size (mirrored by ivfTopKSql)
    val centroids = Similarity.centroidsOf(withNorm, 16)
    val assigned = Caching.cached(Similarity.nearestCentroids(
      withNorm, centroids, "vec_id", "embedding", "nrm", 1))
    val exact = Caching.cached(Similarity.bruteForceTopKFrom(withNorm)
      .select(col("query_id"), col("vec_id")))
    val families: Seq[(String, DataFrame)] = Seq(
      "ivf" -> Similarity.ivfTopKFrom(withNorm, centroids, assigned,
        nProbe = 4, queryMaxId = 8, k = 5),
      "ivf_rerank" -> Similarity.ivfTopKFrom(withNorm, centroids, assigned,
        nProbe = Similarity.IvfRerankProbe, queryMaxId = 8, k = 5),
      "lsh" -> Similarity.lshTopKFrom(withNorm, buckets, probeRadius = 0),
      "lsh_rerank" -> Similarity.lshTopKFrom(withNorm, buckets,
        probeRadius = Similarity.LshProbeRadius),
      "pq_rerank" -> ProductQuantization.ivfPqResRerankTopK(emb))
    val pairs = families.map { case (f, df) =>
      df.select(lit(f).as("family"), col("query_id"), col("vec_id"))
    }.reduce(_.unionAll(_))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val familyList = families.map(_._1).toDF("family")
    val hits = pairs
      .join(broadcast(exact), Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("family")).agg(count(lit(1)).as("__hits"))
    familyList
      .join(broadcast(hits), Seq("family"), "left")
      .select(col("family"), coalesce(col("__hits"), lit(0L)).as("hits"))
      .crossJoin(broadcast(nExact))
      .select(col("family"), col("hits"), col("n_exact"),
        expr("(hits * 1000000) div n_exact").as("recall_ppm"))
      .orderBy(col("family"))
  }
}

/** DuckDB oracle for [[AnnRecallReport]] — each family's certified SQL
  * embedded verbatim as a subquery, the same pair-set semi-join and ppm.
  */
object AnnRecallReportSql {

  val reportSql: String = {
    val families = Seq(
      "ivf" -> SimilaritySql.ivfTopKSql(),
      "ivf_rerank" -> SimilaritySql.ivfTopKSql(
        nProbe = Similarity.IvfRerankProbe),
      "lsh" -> SimilaritySql.lshTopKSql(),
      "lsh_rerank" -> SimilaritySql.lshRerankTopKSql(),
      "pq_rerank" -> ProductQuantizationSql.annIvfPqRerankSql())
    val union = families.map { case (f, sql) =>
      s"SELECT '$f' AS family, query_id, vec_id FROM ($sql) t_$f"
    }.mkString("\nUNION ALL\n")
    val familyValues =
      families.map { case (f, _) => s"('$f')" }.mkString(", ")
    s"""WITH exact AS (
       |  SELECT query_id, vec_id
       |  FROM (${SimilaritySql.bruteForceTopKSql()}) t_exact),
       |fam AS (
       |$union),
       |families(family) AS (VALUES $familyValues),
       |hits AS (
       |  SELECT family, count(*) AS hits
       |  FROM fam
       |  WHERE EXISTS (SELECT 1 FROM exact e
       |                WHERE e.query_id = fam.query_id
       |                  AND e.vec_id = fam.vec_id)
       |  GROUP BY family),
       |n AS (SELECT count(*) AS n_exact FROM exact)
       |SELECT fl.family, coalesce(h.hits, 0) AS hits, n_exact,
       |  (coalesce(h.hits, 0) * 1000000) // n_exact AS recall_ppm
       |FROM families fl LEFT JOIN hits h ON fl.family = h.family
       |CROSS JOIN n
       |ORDER BY fl.family""".stripMargin
  }
}
