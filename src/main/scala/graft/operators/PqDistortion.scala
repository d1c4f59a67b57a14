package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-subspace PQ quantization-distortion report — the index-quality
  * audit behind the M×K codebook choice: for each of the
  * [[ProductQuantization.NumSub]] subspaces, the mean and worst
  * squared quantization error at the chosen (argmin) codeword. A
  * subspace whose mean distortion dwarfs the others carries directions
  * the codebook cannot represent — the signal to re-slice or retrain
  * before ADC ranking quality degrades silently.
  *
  * Scale shape: the per-(vector, subspace, codeword) distances are
  * [[ProductQuantization.subDistances]] VERBATIM (the encoder's own
  * stage — the audit measures exactly what the encoder minimizes,
  * broadcast M×K codebook, no corpus shuffle); the argmin collapses
  * map-side to one row per (vector, subspace) and the report folds to M
  * rows.
  *
  * Exactness: micro-floored integer distances, integer min/sum/max,
  * non-negative `div` mean.
  */
object PqDistortion {

  /** (m, n_vecs, mean_d2_micro, max_d2_micro) per subspace, by m. */
  def report(emb: DataFrame): DataFrame = {
    val dmin = ProductQuantization
      .subDistances(emb, ProductQuantization.subCodebook(emb))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("d_micro")).as("d2"))
    dmin.groupBy(col("m"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2")).as("__s"),
        max(col("d2")).as("max_d2_micro"))
      .select(col("m").cast("long").as("m"), col("n_vecs"),
        expr("__s div n_vecs").as("mean_d2_micro"), col("max_d2_micro"))
      .orderBy(col("m"))
  }

  /** Driver query: the distortion report of the embeddings corpus. */
  def reportEmbeddings(spark: SparkSession, dir: String): DataFrame =
    report(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[PqDistortion]] — the [[ProductQuantizationSql]]
  * codebook/slice/d_micro spellings, min per (vector, subspace), same
  * integer folds.
  */
object PqDistortionSql {
  import ProductQuantization.{NumCodes, NumSub, SubDim}

  val reportEmbeddingsSql: String = {
    def slc(v: String, m: String) =
      s"list_slice($v, $m * $SubDim + 1, $m * $SubDim + $SubDim)"
    val dMicro = (a: String, b: String) =>
      s"CAST(floor(${graft.functions.VectorSql.sqDist(a, b)} * 1e6) AS BIGINT)"
    s"""WITH ms AS (SELECT unnest(range($NumSub)) AS m),
       |cb AS (
       |  SELECT CAST(e.vec_id AS INT) AS code, ms.m,
       |         ${slc("e.embedding", "ms.m")} AS cvec
       |  FROM embeddings e, ms WHERE e.vec_id < $NumCodes),
       |enc AS (
       |  SELECT e.vec_id, ms.m, ${slc("e.embedding", "ms.m")} AS sv
       |  FROM embeddings e, ms),
       |dmin AS (
       |  SELECT enc.vec_id, enc.m,
       |    min(${dMicro("enc.sv", "cb.cvec")}) AS d2
       |  FROM enc JOIN cb ON enc.m = cb.m
       |  GROUP BY 1, 2)
       |SELECT m, count(*) AS n_vecs,
       |  CAST(sum(d2) AS BIGINT) // count(*) AS mean_d2_micro,
       |  max(d2) AS max_d2_micro
       |FROM dmin
       |GROUP BY m ORDER BY m""".stripMargin
  }
}
