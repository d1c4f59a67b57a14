package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Int8 reconstruction-error report — the index-health instrument for the
  * [[Quantize]] path (the [[PqDistortion]] discipline applied to the int8
  * family): per vector, the max and total absolute error of
  * dequantize(quantize(v)) against the original, in 1e-6 units. A serving
  * team reads this before routing distance computations to the int8
  * kernels — outlier-dominated vectors (one huge component inflates the
  * scale, crushing every other dimension's resolution) show up as heavy
  * `sum_abs_err_micro` tails.
  *
  * Exactness: the quantize step is [[Quantize.int8]]'s formula verbatim
  * (same scale, same half-up rounding); the error fold is
  * `floor(|v_i − q_i·scale| · 1e6)` per element — every operation is an
  * IEEE double op evaluated in the same order on both engines, and the
  * floor lands on a bit-identical long per element (the per-element floor
  * rule), so integer max/sum cross the engines exactly.
  *
  * Scale shape: narrow per-row arithmetic, shuffle-free, pipelined with
  * the scan — same map-only pass as the quantizer itself. The
  * scale-evaluated-once two-projection structure is [[Quantize.int8]]'s
  * (re-inlining max|v| into the per-element lambda is O(d²)/row).
  */
object QuantizeError {

  /** (vec_id, n_dims, max_abs_err_micro, sum_abs_err_micro). */
  def report(emb: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val withScale = emb.select(col("vec_id"), col("embedding"),
      (maxAbs / 127.0).as("scale"))
    val errOf = (x: Column) => {
      val xd = x.cast("double")
      val q = when(col("scale") === 0.0, lit(0.0))
        .otherwise(floor(xd / col("scale") + 0.5))
      floor(abs(xd - q * col("scale")) * 1e6).cast("long")
    }
    val errs = transform(col("embedding"), errOf)
    withScale.select(col("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      array_max(errs).as("max_abs_err_micro"),
      aggregate(errs, lit(0L), (a, b) => a + b).as("sum_abs_err_micro"))
      .orderBy(col("vec_id"))
  }

  /** Driver query: the int8 error report of the embeddings corpus. */
  def reportEmbeddings(spark: SparkSession, dir: String): DataFrame =
    report(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[QuantizeError]] — the same formula, the same
  * per-element operation order (1-based lambdas, float widened first).
  */
object QuantizeErrorSql {

  val reportEmbeddingsSql: String = {
    val maxAbs = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    val err = """list_transform(embedding, x ->
                |    CAST(floor(abs(CAST(x AS DOUBLE) -
                |      (CASE WHEN scale = 0.0 THEN 0.0
                |            ELSE floor(CAST(x AS DOUBLE) / scale + 0.5)
                |       END) * scale) * 1000000.0) AS BIGINT))""".stripMargin
    s"""WITH s AS (
       |  SELECT vec_id, embedding, $maxAbs / 127.0 AS scale FROM embeddings),
       |e AS (
       |  SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
       |    $err AS errs
       |  FROM s)
       |SELECT vec_id, n_dims,
       |  CAST(list_max(errs) AS BIGINT) AS max_abs_err_micro,
       |  CAST(list_sum(errs) AS BIGINT) AS sum_abs_err_micro
       |FROM e ORDER BY vec_id""".stripMargin
  }
}
