package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Language-ID CONFIDENCE: the margin between the best and second-best
  * language scores — the router real pipelines use on top of a cheap
  * classifier ("margin 0 → send to the heavy model; margin ≥ 2 → trust
  * the label"). A tie between two languages (or an all-zero score row,
  * predicted `und`) reports margin 0.
  *
  * Reuses [[TF.langScores]]'s integer marker counts and
  * [[TF.langPredict]]'s fixed-priority argmax verbatim, so the predicted
  * label here is by construction the label `text_langid` and the clean
  * chain gate on. All-integer margins — exact on both engines. Narrow:
  * pure codegen'd projection, no shuffle.
  */
object LangIdMargin {

  /** (doc_id, lang_pred, best_score, margin). The
    * [[graft.functions.LangStats]] struct carries all three outputs from
    * one pass; the margin field is by construction
    * `best - greatest(second-best-excluding-pred, 0)` — the spelling the
    * oracle keeps below.
    */
  def margins(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TF.langStats(col("text")).as("ls"))
      .select(col("doc_id"), col("ls.pred").as("lang_pred"),
        col("ls.best").cast("long").as("best_score"),
        col("ls.margin").cast("long").as("margin"))

  /** Driver query: lang-ID margins over the documents table. */
  def marginsDocuments(spark: SparkSession, dir: String): DataFrame =
    margins(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[LangIdMargin]] — same marker counts, same
  * fixed-priority argmax, same integer margin.
  */
object LangIdMarginSql {

  val marginsDocumentsSql: String = {
    val scores = TS.langScores("text")
    val cols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n      |    ")
    val names = scores.map { case (l, _) => s"s_$l" }
    val bestExpr = s"greatest(${names.mkString(", ")})"
    val totalExpr = names.mkString(" + ")
    val predCase = scores.map { case (l, _) =>
      s"WHEN total > 0 AND s_$l = best THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    val secondExpr = "greatest(" + scores.map { case (l, _) =>
      s"CASE WHEN lang_pred = '$l' THEN -1 ELSE s_$l END"
    }.mkString(", ") + ", 0)"
    s"""WITH s AS (
       |  SELECT doc_id,
       |    $cols
       |  FROM documents),
       |b AS (SELECT *, $bestExpr AS best, $totalExpr AS total FROM s),
       |p AS (SELECT *, $predCase AS lang_pred FROM b)
       |SELECT doc_id, lang_pred,
       |  CAST(best AS BIGINT) AS best_score,
       |  CAST(best - $secondExpr AS BIGINT) AS margin
       |FROM p ORDER BY doc_id""".stripMargin
  }
}
