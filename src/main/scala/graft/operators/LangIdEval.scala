package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Lang-ID confusion matrix — the marker-n-gram classifier
  * ([[graft.functions.LangStats]], the certified clean-gate expression)
  * evaluated against the corpus's labeled `lang` column: one row per
  * (labeled, predicted) pair with its count and the row-normalized rate.
  * This is the evaluation report a pipeline owner reads before trusting
  * the gate on a new corpus — which labeled languages leak into `en`,
  * and at what rate.
  *
  * Scale shape: one narrow (lang, text) projection, the one-pass native
  * scoring expression per row, ONE map-side-combined shuffle to the
  * ≤ |langs|² cell domain; row totals fold the cell table (tiny) and
  * broadcast back. Exactness: counts and ppm `div` only.
  */
object LangIdEval {

  /** (lang, lang_pred, n, row_ppm): confusion cells with the share of the
    * labeled language's documents, ordered (lang, lang_pred).
    */
  def confusion(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("lang"), TF.langStats(col("text")).as("ls"))
      .select(col("lang"), col("ls.pred").as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("__t"))
    cells.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("(n * 1000000) div __t").as("row_ppm"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Driver query: the gate classifier's confusion matrix on documents. */
  def confusionDocuments(spark: SparkSession, dir: String): DataFrame =
    confusion(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[LangIdEval]] — the shared SQL spelling of the
  * marker classifier, same cells, same row normalization.
  */
object LangIdEvalSql {

  val confusionDocumentsSql: String =
    s"""WITH cells AS (
       |  SELECT lang, ${TS.langPredict("text")} AS lang_pred, count(*) AS n
       |  FROM documents GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1)
       |SELECT c.lang, c.lang_pred, c.n, (c.n * 1000000) // t.t AS row_ppm
       |FROM cells c JOIN tot t USING (lang)
       |ORDER BY lang, lang_pred""".stripMargin
}
