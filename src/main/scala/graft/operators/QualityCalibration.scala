package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Quality-screen agreement table — the contingency of the two certified
  * quality decisions: the clean chain's closed-form heuristic gate
  * ([[TextAnalysis.qualityScore]] ≥ [[CleanCorpus.QualityMin]], the
  * spelling/constant `pipeline_clean_corpus` runs) against the linear
  * model classifier ([[QualityModel]]'s integer cross-multiplied
  * accept). Off-diagonal mass is exactly the disagreement a pipeline
  * owner inspects before swapping the cheap gate for the model (or
  * running the model only where the gate is uncertain) — the
  * [[MinhashCalibration]] discipline applied to the quality family.
  *
  * Scale shape: the heuristic flag is a narrow projection; the model
  * flag is [[QualityModel.score]]'s certified plan (broadcast weight
  * table, matched-hits-only doc shuffle); the join is doc-keyed and the
  * fold collapses to 4 cells, with shares as a window over those 4 rows.
  *
  * Exactness: flags are 0/1 BIGINTs; shares are ppm `div`.
  */
object QualityCalibration {

  /** (heur_pass, model_pass, n_docs, doc_ppm), ordered by the flags. */
  def contingency(docs: DataFrame): DataFrame = {
    val heur = docs.select(col("doc_id"),
      when(TextAnalysis.qualityScore(col("text")) >= CleanCorpus.QualityMin,
        1L).otherwise(0L).as("heur_pass"))
    val model = QualityModel.score(docs).select(col("doc_id"),
      when(col("accepted"), 1L).otherwise(0L).as("model_pass"))
    heur.join(model, Seq("doc_id"))
      .groupBy(col("heur_pass"), col("model_pass"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__tot", sum(col("n_docs")).over(Window.partitionBy()))
      .select(col("heur_pass"), col("model_pass"), col("n_docs"),
        expr("(n_docs * 1000000) div __tot").as("doc_ppm"))
      .orderBy(col("heur_pass"), col("model_pass"))
  }

  /** Driver query: the quality-screen agreement over the documents table. */
  def contingencyDocuments(spark: SparkSession, dir: String): DataFrame =
    contingency(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[QualityCalibration]] — the same two certified
  * decision spellings, the same cells and ppm.
  */
object QualityCalibrationSql {

  val contingencyDocumentsSql: String =
    s"""WITH heur AS (
       |  SELECT doc_id,
       |    CASE WHEN ${TextAnalysisSql.qualityScoreSql("text")} >=
       |      ${CleanCorpus.QualityMin} THEN 1 ELSE 0 END AS heur_pass
       |  FROM documents),
       |model AS (
       |  SELECT doc_id, CASE WHEN accepted THEN 1 ELSE 0 END AS model_pass
       |  FROM (${QualityModelSql.scoreDocumentsSql}) m),
       |cells AS (
       |  SELECT heur_pass, model_pass, count(*) AS n_docs
       |  FROM heur JOIN model USING (doc_id)
       |  GROUP BY 1, 2)
       |SELECT CAST(heur_pass AS BIGINT) AS heur_pass,
       |  CAST(model_pass AS BIGINT) AS model_pass, n_docs,
       |  (n_docs * 1000000) // CAST(sum(n_docs) OVER () AS BIGINT) AS doc_ppm
       |FROM cells
       |ORDER BY heur_pass, model_pass""".stripMargin
}
