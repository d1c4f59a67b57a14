package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** MinHash estimator calibration — the (estimated, exact) similarity
  * contingency over the LSH candidate pairs: how often a signature
  * agreement rate of 0.6-0.7 really means Jaccard 0.6-0.7 on THIS
  * corpus. This is the table an operator reads before trusting a
  * signature-only (verification-free) dedup pass at scale — off-diagonal
  * mass is exactly the error that pass would commit.
  *
  * Scale shape: the candidate stage is
  * [[Dedup.minhashCandidatePairsFromSigs]] (the certified
  * `dedup_minhash_lsh` stage, composed identically through
  * [[Dedup.minhashCandidatePairs]] there) and the exact Jaccard is the
  * one [[Dedup.jaccardOf]] spelling [[Dedup.pairJaccard]] runs — the
  * calibration audits the estimator on the same pair population the
  * dedup sees. Per-doc payloads (shingle set + signature) are ONE cached
  * (doc_id, sh, mh) frame fetched once per pair side (two doc_id
  * equi-joins, not four); the agreement/jaccard folds collapse to
  * ≤ 11×11 cells.
  *
  * Exactness: the agreement count is integer; its band is a
  * non-negative `div`; the exact-Jaccard band floors the IEEE division
  * (correctly rounded, identical cross-engine) once per pair.
  */
object MinhashCalibration {

  /** (est_band, true_band, n_pairs): bands are tenths (0-10; 10 = exact
    * 1.0), ordered (est_band, true_band).
    */
  def contingency(docs: DataFrame, n: Int = Dedup.ShingleN,
      maxBucket: Int = Dedup.MaxBucket): DataFrame = {
    val sets = Caching.cached(Dedup.hashedShingleSets(docs, n))
    // (doc_id, sh, mh) computed ONCE and cached: the signature transform
    // runs a single time (the four-join form replayed it per consumer),
    // and each pair side fetches BOTH its shingle set and its signature
    // in one doc_id equi-join — two joins instead of four, two fewer
    // doc-keyed shuffles (plan index: 13 → 9 exchanges)
    val payload = Caching.cached(Dedup.setSignaturePayload(sets))
    val cand = Dedup.minhashCandidatePairsFromSigs(
      payload.select(col("doc_id"), col("mh")), maxBucket,
      "minhash_calibration_caps")
    val matches = aggregate(
      zip_with(col("ma"), col("mb"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    cand
      .join(payload.select(col("doc_id").as("doc_a"),
        col("sh").as("sha"), col("mh").as("ma")), Seq("doc_a"))
      .join(payload.select(col("doc_id").as("doc_b"),
        col("sh").as("shb"), col("mh").as("mb")), Seq("doc_b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .select(matches.as("__m"),
        Dedup.jaccardOf(col("sha"), col("shb"), col("common")).as("jaccard"))
      .select(expr(s"(__m * 10) div ${Dedup.NumHashes}").as("est_band"),
        floor(col("jaccard") * 10).cast("long").as("true_band"))
      .groupBy(col("est_band"), col("true_band"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("est_band"), col("true_band"))
  }

  /** Driver query: the calibration table of the documents corpus. */
  def contingencyDocuments(spark: SparkSession, dir: String): DataFrame =
    contingency(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[MinhashCalibration]] — the shared LSH candidate
  * CTE chain ([[DedupSql.lshCandCtes]]), the same 1-based zip agreement
  * count, the same bands.
  */
object MinhashCalibrationSql {
  import Dedup.NumHashes

  val contingencyDocumentsSql: String = {
    val agree = s"""CAST(list_sum(list_transform(range($NumHashes),
       i -> CASE WHEN ma.mh[i + 1] = mb.mh[i + 1] THEN 1 ELSE 0 END))
       AS BIGINT)"""
    s"""WITH ${DedupSql.lshCandCtes()},
       |sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
       |inv AS (SELECT doc_id, unnest(sh) AS s FROM sets),
       |common AS (
       |  SELECT doc_a, doc_b, count(*) AS common
       |  FROM cand
       |  JOIN inv a ON doc_a = a.doc_id
       |  JOIN inv b ON doc_b = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |jc AS (
       |  -- LEFT join: a band collision with zero shared shingles is a
       |  -- real candidate pair (jaccard 0) and must stay in the table
       |  SELECT cd.doc_a, cd.doc_b,
       |    CAST(COALESCE(c.common, 0) AS DOUBLE) /
       |      CAST(sa.sz + sb.sz - COALESCE(c.common, 0) AS DOUBLE) AS jaccard
       |  FROM cand cd
       |  LEFT JOIN common c ON cd.doc_a = c.doc_a AND cd.doc_b = c.doc_b
       |  JOIN sizes sa ON cd.doc_a = sa.doc_id
       |  JOIN sizes sb ON cd.doc_b = sb.doc_id),
       |banded2 AS (
       |  SELECT ($agree * 10) // $NumHashes AS est_band,
       |    CAST(floor(j.jaccard * 10) AS BIGINT) AS true_band
       |  FROM jc j
       |  JOIN mh ma ON j.doc_a = ma.doc_id
       |  JOIN mh mb ON j.doc_b = mb.doc_id)
       |SELECT est_band, true_band, count(*) AS n_pairs
       |FROM banded2
       |GROUP BY 1, 2
       |ORDER BY est_band, true_band""".stripMargin
  }
}
