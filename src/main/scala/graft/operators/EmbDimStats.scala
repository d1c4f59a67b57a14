package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-dimension embedding statistics — the normalization-constant pass a
  * vector pipeline runs before whitening, scaling, or product
  * quantization (PQ codebook conditioning wants centered, comparably-
  * scaled dimensions): for every dimension, the count, sum, sum of
  * squares, min and max of the micro-floored values.
  *
  * Exactness: each element widens float→double and floors `v·1e6` — both
  * engines compute the identical IEEE double product, so the floor is
  * bit-equal everywhere (no once-per-distinct discipline needed, unlike
  * `ln`) — and every aggregate is an INTEGER sum/extreme of those micro
  * values, immune to accumulation order. No mean/variance division is
  * emitted (a signed `div` truncates toward zero in Spark but floors in
  * DuckDB); consumers derive moments from (n, sum, sumsq) exactly.
  *
  * Scale shape: one narrow posexplode and ONE map-side-combined shuffle
  * collapsing to |dims| rows per task before exchange — the
  * power-iteration shape. The two sums accumulate in DECIMAL(38,0)
  * (terms ≤ 1e12 at |v|≤1, so 38 digits hold ~1e26 vectors per dimension
  * — exact at any reachable scale, matching DuckDB's HUGEINT
  * accumulator; a plain int64 sum would wrap silently past ~9e6
  * vectors/dim on the Spark side while DuckDB's BIGINT cast errors,
  * turning overflow into an opaque cross-engine divergence) and are cast
  * back to BIGINT for the certified surface.
  */
object EmbDimStats {

  /** (dim, n_vecs, sum_micro, sumsq_micro, min_micro, max_micro). */
  def stats(emb: DataFrame): DataFrame = {
    val m = floor(col("x").cast("double") * 1e6).cast("long")
    emb.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("int").as("dim"), m.as("m"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("m").cast("decimal(38,0)")).cast("long").as("sum_micro"),
        sum((col("m") * col("m")).cast("decimal(38,0)")).cast("long")
          .as("sumsq_micro"),
        min(col("m")).as("min_micro"),
        max(col("m")).as("max_micro"))
  }

  /** Driver query: dimension stats of the embeddings table. */
  def statsEmbeddings(spark: SparkSession, dir: String): DataFrame =
    stats(Tables.embeddings(spark, dir)).orderBy(col("dim"))
}

/** DuckDB oracle for [[EmbDimStats]] — same micro floor, same integer
  * aggregates (1-based subscripts shifted to the 0-based dim).
  */
object EmbDimStatsSql {

  val statsEmbeddingsSql: String =
    """WITH m AS (
      |  SELECT CAST(i - 1 AS INT) AS dim,
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS m
      |  FROM (SELECT unnest(embedding) AS x,
      |               generate_subscripts(embedding, 1) AS i
      |        FROM embeddings))
      |SELECT dim, count(*) AS n_vecs,
      |  CAST(sum(m) AS BIGINT) AS sum_micro,
      |  CAST(sum(m * m) AS BIGINT) AS sumsq_micro,
      |  min(m) AS min_micro, max(m) AS max_micro
      |FROM m GROUP BY 1 ORDER BY dim""".stripMargin
}
