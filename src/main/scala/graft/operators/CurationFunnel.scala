package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** The curation FUNNEL report — the observability composite every data
  * pipeline dashboard shows: per source, how many documents survive each
  * stage of the certified clean chain (raw → language gate → quality gate
  * → dedup winners) and the surviving token budget. Drops between stages
  * localize WHERE a domain is losing data (bad lang labels vs low quality
  * vs duplication) before anyone retrains.
  *
  * Stage semantics reuse [[CleanCorpus]]'s exact expressions — the gates
  * via the same predicates, the dedup stage via [[CleanCorpus.cleanUnordered]]
  * itself — so the funnel can never disagree with what the clean pipeline
  * actually keeps. A deduped group is attributed to its WINNER's source
  * (lowest doc_id, the kept row).
  *
  * Scale shape: two corpus passes — one conditional-count aggregation
  * over the raw scan (n_raw/n_lang/n_quality collapse map-side to
  * |sources| rows; the gate predicates are narrow codegen'd projections),
  * and the clean chain's own single dedup shuffle for the winner stage.
  * The final join runs on |sources|-row tables. A deployment that cannot
  * afford the second scan maintains the streaming clean LEDGER instead
  * ([[graft.streaming.StreamingCleanCorpus]]) and reads the funnel off
  * its state.
  */
object CurationFunnel {

  /** (source, n_raw, n_lang, n_quality, n_unique, tokens_final). */
  def funnel(docs: DataFrame): DataFrame = {
    val langOk = TF.langPredict(col("text")) === col("lang")
    val qualOk = langOk &&
      TextAnalysis.qualityScore(col("text")) >= CleanCorpus.QualityMin
    val stages = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        count(when(langOk, 1)).as("n_lang"),
        count(when(qualOk, 1)).as("n_quality"))
    val winners = CleanCorpus.cleanUnordered(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"), sum(col("n_tokens")).as("tokens_final"))
    stages.join(winners, Seq("source"), "left")
      .select(col("source"), col("n_raw"), col("n_lang"), col("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("tokens_final"), lit(0L)).as("tokens_final"))
  }

  /** Driver query: the curation funnel of the documents table. */
  def funnelDocuments(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.documents(spark, dir)).orderBy(col("source"))
}

/** DuckDB oracle for [[CurationFunnel]] — the same stage predicates and
  * winner attribution as the certified clean-chain SQL.
  */
object CurationFunnelSql {

  val funnelDocumentsSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source, lang, text,
       |    ${CleanCorpusSql.scoredColsSql}
       |  FROM documents),
       |stages AS (
       |  SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_raw,
       |    CAST(count(CASE WHEN lang_pred = lang THEN 1 END) AS BIGINT)
       |      AS n_lang,
       |    CAST(count(CASE WHEN ${CleanCorpusSql.gateWhereSql} THEN 1 END)
       |      AS BIGINT) AS n_quality
       |  FROM scored GROUP BY 1),
       |winners AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_unique,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_final
       |  FROM (
       |    SELECT source, n_tokens,
       |      ${CleanCorpusSql.dedupRnSql} AS rn
       |    FROM scored
       |    WHERE ${CleanCorpusSql.gateWhereSql})
       |  WHERE rn = 1 GROUP BY 1)
       |SELECT s.source, s.n_raw, s.n_lang, s.n_quality,
       |  coalesce(w.n_unique, 0) AS n_unique,
       |  coalesce(w.tokens_final, 0) AS tokens_final
       |FROM stages s LEFT JOIN winners w USING (source)
       |ORDER BY s.source""".stripMargin
}
