package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Co-shingle Jaccard histogram — the dedup-threshold-tuning instrument:
  * the full similarity curve of every co-shingle document pair, banded in
  * 0.1 steps. `dedup_ngram_jaccard` reports the pairs above ONE
  * threshold; this shows where the mass sits so the threshold is chosen
  * from data (the text-side analogue of `emb_distance_histogram`, which
  * plays the same role for the embedding near-dup family).
  *
  * The scored-pair stage IS [[Dedup.jaccardScoredPairs]] — the exact
  * machinery `dedup_ngram_jaccard` filters (hashed shingles, df-capped
  * inverted index, never all-pairs), shared as one spelling.
  *
  * Exactness: bands and ppm bounds are non-negative integer division of
  * the exact (common, union) counts — the double jaccard never crosses an
  * aggregation. Band 10 is the exact-duplicate point mass (jaccard = 1).
  */
object JaccardHistogram {

  /** (band, n_pairs, min_ppm, max_ppm): pair counts per 0.1 Jaccard band
    * with the exact ppm extremes inside each band.
    */
  def histogram(docs: DataFrame): DataFrame =
    Dedup.jaccardScoredPairs(docs)
      .select(expr("(common * 10) div (sz_a + sz_b - common)").as("band"),
        expr("(common * 1000000) div (sz_a + sz_b - common)").as("ppm"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ppm")).as("min_ppm"), max(col("ppm")).as("max_ppm"))
      .orderBy(col("band"))

  /** Driver query: the Jaccard curve of the documents corpus. */
  def histogramDocuments(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[JaccardHistogram]] — the ngram-Jaccard machinery
  * (same shingles, same df cap) without the threshold, same integer bands.
  */
object JaccardHistogramSql {

  def histogramDocumentsSql(n: Int = Dedup.ShingleN,
      maxShingleDf: Int = Dedup.MaxShingleDf): String =
    s"""WITH ${DedupSql.shingleCte(n)},
       |inv0 AS (SELECT doc_id, unnest(sh) AS s FROM sets),
       |hot AS (SELECT s FROM inv0 GROUP BY s HAVING count(*) > $maxShingleDf),
       |inv AS (SELECT * FROM inv0 WHERE s NOT IN (SELECT s FROM hot)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM inv GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |u AS (
       |  SELECT common, sa.sz + sb.sz - common AS un
       |  FROM common
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id)
       |SELECT (common * 10) // un AS band,
       |  count(*) AS n_pairs,
       |  min((common * 1000000) // un) AS min_ppm,
       |  max((common * 1000000) // un) AS max_ppm
       |FROM u
       |GROUP BY 1
       |ORDER BY band""".stripMargin
}
