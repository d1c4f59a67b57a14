package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One-component PCA projection — every vector's coordinate along the
  * corpus's dominant direction, the 1-D shadow used for embedding-drift
  * monitoring, coarse curriculum ordering, and as the first split of a
  * spill-free kd-ish partitioner. The direction is ONE
  * [[Similarity.powerIterationStep]] matvec (certified separately as
  * `emb_power_iteration`, reused verbatim here), quantized to kilo-units
  * of its largest component so the per-row projection is bounded
  * INDEPENDENT of corpus size.
  *
  * Exactness: components are the shared 1e3-scaled longs; the direction
  * is quantized as `w = sign(y) · (|y| div greatest(max|y| div 1000, 1))`
  * — `div` touches only non-negative operands (Spark `div` truncates
  * toward zero, DuckDB `//` floors; they agree only there, so the sign
  * is factored out), giving |w| ≤ ~1000 with NO widening multiply: the
  * quantizer inherits the power step's own overflow headroom (~5e11
  * rows) rather than narrowing it. The projection
  * `proj_kilo = Σ_d v_d·w_d` is then an integer fold bounded by
  * 64·|v|·1000 per row at any scale.
  *
  * Scale shape: the matvec is the power step's one map-side-combined
  * pass; the direction table is Dim rows → its max is a single-row
  * broadcast (counted BNLJ), the quantized vector collapses to ONE
  * broadcast array row (the [[Similarity.labelOutliers]] centroid
  * pattern, counted BNLJ), and scoring is a per-row zip_with/aggregate
  * fold — no data-sized join, no exploded shuffle.
  */
object PcaProject {

  /** (vec_id, label, proj_kilo): each vector's integer coordinate along
    * the quantized dominant direction.
    */
  def project(emb: DataFrame): DataFrame = {
    val y = Similarity.powerIterationStep(emb)
    val maxabs = y.agg(greatest(max(abs(col("y_milli2"))), lit(1L)).as("__m"))
    val wvec = y.join(broadcast(maxabs))
      .select(col("pos"),
        (when(col("y_milli2") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("abs(y_milli2) div greatest(__m div 1000, 1)")).as("w"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")).as("wvec"))
    val sv = transform(col("embedding"),
      x => floor(x.cast("double") * 1e3).cast("long"))
    emb.select(col("vec_id"), col("label"), sv.as("sva"))
      .join(broadcast(wvec))
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("sva"), col("wvec"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj_kilo"))
      .orderBy(col("vec_id"))
  }

  /** Driver query: the PCA shadow of the embeddings corpus. */
  def projectEmbeddings(spark: SparkSession, dir: String): DataFrame =
    project(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[PcaProject]] — the same milli-scaled matvec (the
  * [[SimilaritySql.powerIterationSql]] core), the same sign-factored
  * non-negative quantizer, the same integer projection fold.
  */
object PcaProjectSql {

  val projectEmbeddingsSql: String =
    """WITH sv AS (
      |  SELECT vec_id, label,
      |    generate_subscripts(embedding, 1) - 1 AS pos,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id, CAST(sum(v) AS BIGINT) AS q FROM sv GROUP BY vec_id),
      |y AS (
      |  SELECT sv.pos, CAST(sum(q.q * sv.v) AS BIGINT) AS y
      |  FROM sv JOIN q USING (vec_id) GROUP BY 1),
      |m AS (SELECT greatest(max(abs(y)), 1) AS m FROM y),
      |w AS (
      |  SELECT pos,
      |    (CASE WHEN y < 0 THEN -1 ELSE 1 END) *
      |      (abs(y) // greatest(m // 1000, 1)) AS w
      |  FROM y, m)
      |SELECT sv.vec_id, sv.label,
      |  CAST(sum(sv.v * w.w) AS BIGINT) AS proj_kilo
      |FROM sv JOIN w USING (pos)
      |GROUP BY 1, 2
      |ORDER BY vec_id""".stripMargin
}
