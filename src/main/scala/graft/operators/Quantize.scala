package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of the embedding column — the storage/compute
  * shape ANN serving actually deploys at scale (4x smaller vectors, integer
  * SIMD distance kernels). Per vector: scale = max|v| / 127, q_i =
  * floor(v_i / scale + 0.5) in [-127, 127].
  *
  * Scale shape: narrow per-row arithmetic, shuffle-free, pipelined with the
  * parquet scan — quantizing 100 TB of vectors is a map-only pass. All math
  * is float->double exact on both engines (float widening, double division,
  * floor — no round-half banker's ambiguity), so the driver oracle checks
  * the quantized payload EXACTLY via its md5, not a tolerance band.
  */
object Quantize {

  /** (vec_id, n_dims, scale, q_hash): q_hash is the md5 of the
    * comma-joined int codes — the payload identity without shipping the
    * array through the compare. The scale-evaluated-once structure (alias +
    * second projection) keeps the max|v| pass from re-inlining into the
    * per-element lambda (the RepetitionStats lesson — O(d^2) otherwise).
    */
  def int8(emb: DataFrame): DataFrame = {
    val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val withScale = emb.select(col("vec_id"), col("embedding"),
      (maxAbs / 127.0).as("scale"))
    val codes = transform(col("embedding"), x =>
      when(col("scale") === 0.0, 0L)
        .otherwise(floor(x.cast("double") / col("scale") + 0.5)).cast("string"))
    withScale.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      col("scale"),
      md5(concat_ws(",", codes).cast("binary")).as("q_hash"))
  }
}

/** DuckDB oracle for [[Quantize]] — same formula, same join/serialization
  * order, float widened to double before any arithmetic on both sides.
  */
object QuantizeSql {

  val int8Sql: String = {
    val maxAbs = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    val codes = """list_transform(embedding, x ->
                  |    CAST(CASE WHEN scale = 0.0 THEN 0
                  |      ELSE CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)
                  |    END AS VARCHAR))""".stripMargin
    s"""WITH s AS (
       |  SELECT vec_id, embedding, $maxAbs / 127.0 AS scale FROM embeddings)
       |SELECT vec_id,
       |  CAST(len(embedding) AS BIGINT) AS n_dims,
       |  scale,
       |  md5(array_to_string($codes, ',')) AS q_hash
       |FROM s ORDER BY vec_id""".stripMargin
  }
}
