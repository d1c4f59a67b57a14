package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** The second END-TO-END composite, built from the round-15 surface the
  * way [[Assemble]] composes the round-14 one: REWRITE-then-gate-then-
  * budget —
  *
  *   boilerplate strip (the text a trainer actually consumes)
  *     → the certified clean chain ON THE STRIPPED TEXT (lang gate,
  *       quality gate, exact dedup — so chrome-only differences between
  *       near-identical pages collapse to one survivor, the case raw-text
  *       dedup structurally misses)
  *     → per-source token-budget prefix over the survivors' STRIPPED
  *       token counts (the budget pays for signal, not for chrome).
  *
  * Every stage IS the standalone operator: [[Boilerplate.strip]],
  * [[CleanCorpus.cleanUnordered]] fed the stripped text verbatim, and
  * [[BudgetSample.samplePreTokenized]] on the chain's own token counts —
  * no expression is respelled, so the composite cannot drift from the
  * parts the driver certifies individually.
  *
  * Scale shape: the strip's doc-keyed exchange, the clean chain's one
  * content-hash shuffle, the budget's histogram cutoff — plus ONE
  * doc-keyed join re-attaching (lang, source) to the stripped text
  * (strip's contract is content-only). Nothing quadratic anywhere.
  */
object Curate {

  /** (doc_id, source, n_tokens): the curated, budget-capped corpus. */
  def curate(docs: DataFrame): DataFrame = {
    val stripped = Boilerplate.strip(docs)
      .select(col("doc_id"), col("text_stripped").as("text"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
    val cleaned = CleanCorpus.cleanUnordered(stripped)
    BudgetSample.samplePreTokenized(
      cleaned.select(col("doc_id"), col("source"), col("n_tokens")))
  }

  /** Driver query: the curated documents table. */
  def curateDocuments(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[Curate]] — the standalone stages' oracle CTEs
  * chained: the strip chain, the clean chain's gate/dedup spelling on the
  * stripped text, the budget prefix.
  */
object CurateSql {

  val curateDocumentsSql: String = {
    val hv = BudgetSampleSql.hvSql
    s"""WITH ${BoilerplateSql.strippedCtes},
       |docs2 AS (
       |  SELECT d.doc_id, s.text_stripped AS text, d.lang, d.source
       |  FROM documents d JOIN stripped s USING (doc_id)),
       |scored AS (
       |  SELECT doc_id, source, lang, text,
       |    ${CleanCorpusSql.scoredColsSql}
       |  FROM docs2),
       |cleaned AS (
       |  SELECT doc_id, source, n_tokens FROM (
       |    SELECT doc_id, source, n_tokens,
       |      ${CleanCorpusSql.dedupRnSql} AS rn
       |    FROM scored
       |    WHERE ${CleanCorpusSql.gateWhereSql})
       |  WHERE rn = 1),
       |h AS (SELECT doc_id, source, n_tokens, $hv AS hv FROM cleaned),
       |${BudgetSampleSql.prefixTailSql}""".stripMargin
  }
}
