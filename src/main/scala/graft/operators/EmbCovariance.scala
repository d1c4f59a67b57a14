package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pairwise dimension co-moment sums — the covariance/PCA-prep pass one
  * step up from [[EmbDimStats]]: for every dimension pair (i ≤ j), the
  * exact integer sum Σ xᵢ·xⱼ over the corpus (micro-floored elements).
  * Together with EmbDimStats' (n, sum) these give the full covariance
  * matrix exactly — whitening, PCA beyond [[Similarity]]'s top
  * eigenvector, and Mahalanobis outlier scoring all start here.
  *
  * Exactness: the same element discipline as EmbDimStats (bit-equal
  * float→double micro floors, integer products ≤ 1e12/term, DECIMAL(38,0)
  * accumulation cast back to BIGINT), so the diagonal (i = j) reproduces
  * EmbDimStats' `sumsq_micro` bit-for-bit — pinned in the spec.
  *
  * Scale shape: both join sides are the SAME (vec_id, dim, m) element
  * subplan — under the broadcast threshold the planner builds it once as
  * a broadcast (the observed sf plan); above it, the vec_id exchange is
  * materialized once and reused (ReusedExchange). The per-vector join
  * fans out to the |Dim|²/2 pair domain, and the aggregation is map-side
  * combined down to ~2k rows before its shuffle.
  * The |Dim|-fold element exchange is linear in corpus size; the upgrade
  * path at extreme scale is a native one-pass outer-product accumulator
  * (the [[graft.functions.RepetitionStats]] pattern), swap point here.
  */
object EmbCovariance {

  /** (dim_i, dim_j, n_vecs, sum_xy_micro) for every pair i ≤ j. */
  def comoments(emb: DataFrame): DataFrame = {
    val m = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("int").as("dim"),
        floor(col("x").cast("double") * 1e6).cast("long").as("m"))
    m.as("a")
      .join(m.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.dim") <= col("b.dim"))
      .groupBy(col("a.dim").as("dim_i"), col("b.dim").as("dim_j"))
      .agg(count(lit(1)).as("n_vecs"),
        sum((col("a.m") * col("b.m")).cast("decimal(38,0)")).cast("long")
          .as("sum_xy_micro"))
  }

  /** Driver query: co-moment sums of the embeddings table. */
  def comomentsEmbeddings(spark: SparkSession, dir: String): DataFrame =
    comoments(Tables.embeddings(spark, dir)).orderBy(col("dim_i"), col("dim_j"))
}

/** DuckDB oracle for [[EmbCovariance]] — same micro floor, same i ≤ j
  * pair domain (1-based subscripts shifted to 0-based dims), same integer
  * accumulation.
  */
object EmbCovarianceSql {

  val comomentsEmbeddingsSql: String =
    """WITH m AS (
      |  SELECT vec_id, CAST(i - 1 AS INT) AS dim,
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS m
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |               generate_subscripts(embedding, 1) AS i
      |        FROM embeddings))
      |SELECT a.dim AS dim_i, b.dim AS dim_j, count(*) AS n_vecs,
      |  CAST(sum(a.m * b.m) AS BIGINT) AS sum_xy_micro
      |FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      |GROUP BY 1, 2 ORDER BY dim_i, dim_j""".stripMargin
}
