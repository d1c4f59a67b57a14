package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF, VectorSql => VS}
import graft.sources.Tables

/** Candidate-pair cosine histogram — the distance-concentration
  * diagnosis behind ANN tuning: the distribution of cosine similarity
  * over the LSH candidate pairs, binned to [[BinsPerUnit]] buckets per
  * unit. A distribution squeezed into a narrow band is exactly the
  * regime where quantized (PQ) distances stop separating neighbors —
  * the measured cause of the residual-PQ recall floor this engine
  * records (AnnRecallSf01Spec) — so this report is how an operator
  * decides between raising nprobe, deepening re-rank, or retraining
  * codebooks.
  *
  * The candidate stage IS [[Dedup.lshCandidatePairs]] verbatim (the
  * near-dup/kNN-graph machinery), so the histogram describes precisely
  * the pair population those operators score — by construction a
  * bucket-biased sample of all pairs (co-bucketed pairs skew similar),
  * which is the population that matters: pairs the index will actually
  * compare.
  *
  * Exactness: bin = floor(cos · bins) on the identical IEEE double both
  * engines compute (bit-equal per-element floors, no ln anywhere);
  * counts are integers.
  */
object DistanceHistogram {

  /** Histogram resolution: bins per unit of cosine (bin width 0.05). */
  val BinsPerUnit = 20

  /** (bin, lo_centi, n_pairs): candidate-pair cosine counts, where
    * `bin` = floor(cos·[[BinsPerUnit]]) and `lo_centi` is the bucket's
    * inclusive lower edge in centi-units (−100..100).
    */
  def histogram(emb: DataFrame,
      tables: Int = Dedup.NearDupTables): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      VF.norm(col("embedding")).as("nrm"))
    Dedup.lshCandidatePairs(emb, tables)
      .join(withNorm.as("a"), col("vec_a") === col("a.vec_id"))
      .join(withNorm.as("b"), col("vec_b") === col("b.vec_id"))
      .withColumn("nn", col("a.nrm") * col("b.nrm"))
      .withColumn("cos", when(col("nn") === 0.0, 0.0)
        .otherwise(VF.dot(col("a.embedding"), col("b.embedding")) / col("nn")))
      .select(floor(col("cos") * BinsPerUnit).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bin"),
        (col("bin") * (100L / BinsPerUnit)).as("lo_centi"), col("n_pairs"))
      .orderBy(col("bin"))
  }

  /** Driver query: the candidate-pair cosine histogram of the
    * embeddings table.
    */
  def histogramEmbeddings(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[DistanceHistogram]] — same deterministic buckets,
  * same IEEE floor binning.
  */
object DistanceHistogramSql {

  def histogramEmbeddingsSql(tables: Int = Dedup.NearDupTables): String = {
    val bucketList = (0 until tables)
      .map(t => s"${SimilaritySql.tableBucketSql("embedding", t)} + ${t.toLong << 32}")
      .mkString("[", ",\n  ", "]")
    val bins = DistanceHistogram.BinsPerUnit
    s"""WITH bucketed AS (
       |  SELECT vec_id, unnest($bucketList) AS bk FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bucketed a JOIN bucketed b ON a.bk = b.bk AND a.vec_id < b.vec_id),
       |binned AS (
       |  SELECT CAST(floor(${VS.cosine("a.embedding", "b.embedding")} * $bins)
       |    AS BIGINT) AS bin
       |  FROM cand
       |  JOIN embeddings a ON vec_a = a.vec_id
       |  JOIN embeddings b ON vec_b = b.vec_id)
       |SELECT bin, bin * ${100L / bins} AS lo_centi,
       |       count(*) AS n_pairs
       |FROM binned GROUP BY bin
       |ORDER BY bin""".stripMargin
  }
}
