package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Vector-norm histogram — the normalization sanity check run before any
  * cosine-based stage (ANN, near-dup, centroid routing): the distribution
  * of embedding L2 norms in 0.1 bands. A corpus whose norms spread widely
  * makes raw dot products incomparable (and IVF cell assignment
  * magnitude-biased); a spike at 1.0 confirms unit-normalized input. The
  * third instrument next to `emb_distance_histogram` (pair geometry) and
  * `emb_dim_stats` (per-dimension moments).
  *
  * Scale shape: one narrow posexplode, ONE map-side-combined shuffle to
  * |vectors| rows (the per-vector sumsq), then a histogram-sized final
  * aggregate. No joins.
  *
  * Exactness: per-element micro floors (bit-equal IEEE multiply), integer
  * sumsq per vector, then `floor(sqrt(sumsq))` — sqrt is correctly
  * rounded in both engines and sumsq ≤ dims·(1.1e6)² sits far inside
  * 2^53, so the micro norm is bit-identical; bands are non-negative
  * integer division.
  */
object NormHistogram {

  /** Micro-norm units per band (0.1 in vector units). */
  val BandMicros = 100000L

  /** (band, n_vecs, min_norm_micro, max_norm_micro) per 0.1 norm band. */
  def histogram(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"),
        floor(col("x").cast("double") * 1e6).cast("long").as("m"))
      .groupBy(col("vec_id"))
      .agg(sum(col("m") * col("m")).as("ss"))
      .select(floor(sqrt(col("ss").cast("double"))).cast("long")
        .as("norm_micro"))
      .select(expr(s"norm_micro div $BandMicros").as("band"), col("norm_micro"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("norm_micro")).as("min_norm_micro"),
        max(col("norm_micro")).as("max_norm_micro"))
      .orderBy(col("band"))

  /** Driver query: the norm histogram of the embeddings table. */
  def histogramEmbeddings(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[NormHistogram]] — same micro floors, same integer
  * sumsq, same floored sqrt and bands.
  */
object NormHistogramSql {

  val histogramEmbeddingsSql: String =
    s"""WITH m AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS m
       |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)),
       |norms AS (
       |  SELECT CAST(floor(sqrt(CAST(CAST(sum(m * m) AS BIGINT) AS DOUBLE)))
       |    AS BIGINT) AS norm_micro
       |  FROM m GROUP BY vec_id)
       |SELECT norm_micro // ${NormHistogram.BandMicros} AS band,
       |  count(*) AS n_vecs,
       |  min(norm_micro) AS min_norm_micro,
       |  max(norm_micro) AS max_norm_micro
       |FROM norms
       |GROUP BY 1
       |ORDER BY band""".stripMargin
}
