package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** The composite corpus-cleaning pipeline — the CCNet-shaped chain a
  * training-data user actually runs, as ONE declarative query:
  *
  *   language gate  →  quality gate  →  exact dedup  →  split assignment
  *
  * Every stage reuses the standalone operator's exact expression
  * ([[TextAnalysis.qualityScore]], `TF.langPredict`,
  * [[TextAnalysis.splitAssign]], the `dedup_exact` content hash), so a green
  * oracle certifies the COMPOSITION, not re-derived logic — and a user gets
  * identical per-stage semantics whether they run the stages separately or
  * fused.
  *
  * Scale shape (the reason to fuse): the gates are narrow codegen'd
  * projections that run INSIDE the scan stage, so at 100 TB the filtered-out
  * rows (wrong language, low quality) never reach a shuffle. The only wide
  * operation in the whole pipeline is the single dedup aggregation, keyed by
  * content hash with map-side `min_by`/`count` combine — one shuffle of only
  * the surviving rows, each reduced to (hash, kept-row, count) before it
  * moves. Compare running the stages as separate jobs: each materializes and
  * re-scans the corpus. The fused plan reads it once.
  *
  * Reference anchor: the reference stores every message unconditionally
  * (`mqtt2sql.py:579-591`); cleaning/filtering is the extension surface the
  * driver mandates for LLM-pipeline use, not reference parity.
  */
object CleanCorpus {

  /** Minimum rounded quality score a document must reach to survive. */
  val QualityMin = 0.35

  /** Kept documents with provenance columns: one row per surviving content
    * hash (lowest doc_id wins), with how many in-gate copies it had and its
    * deterministic train/valid/test split.
    */
  /** The stateless gate stage (language gate, quality gate, per-doc
    * columns) — shared with the streaming twin
    * ([[graft.streaming.StreamingCleanCorpus]]), where it runs unchanged
    * inside the micro-batch projection.
    */
  def gatedDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("lang_pred", TF.langPredict(col("text")))
      .filter(col("lang_pred") === col("lang"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= QualityMin)
      .withColumn("n_tokens", TF.nTokens(col("text")).cast("long"))
      .withColumn("content_hash", md5(trim(col("text")).cast("binary")))

  /** [[clean]] without the presentation sort, and — when the input carries
    * a `source` column — with the winner's source riding the scan
    * projection and the min_by struct, so a downstream composite's
    * domain-mixing stage ([[Assemble]]) costs no extra corpus join.
    * [[clean]]'s certified surface is unchanged (it drops the extra
    * column); inputs without `source` (the spec's minimal frames) behave
    * exactly as before.
    */
  def cleanUnordered(docs: DataFrame): DataFrame = {
    val withSource = docs.columns.contains("source")
    val keepCols = Seq(col("doc_id"), col("lang"), col("quality"),
      col("n_tokens")) ++ (if (withSource) Seq(col("source")) else Nil)
    val outCols = Seq(col("keep.doc_id").as("doc_id"),
      col("keep.lang").as("lang"), col("keep.quality").as("quality"),
      col("keep.n_tokens").as("n_tokens")) ++
      (if (withSource) Seq(col("keep.source").as("source")) else Nil) :+
      col("n_copies")
    gatedDocs(docs)
      .groupBy(col("content_hash"))
      .agg(min_by(struct(keepCols: _*), col("doc_id")).as("keep"),
        count(lit(1)).as("n_copies"))
      .select(outCols: _*)
      .withColumn("split", TextAnalysis.splitAssign(col("doc_id")))
  }

  def clean(docs: DataFrame): DataFrame =
    cleanUnordered(docs).drop("source").orderBy(col("doc_id"))

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame =
    clean(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[CleanCorpus]] — the same chain from the same shared
  * expression generators ([[TextAnalysisSql]], `TextSql`), composed in SQL.
  */
object CleanCorpusSql {
  import graft.functions.{TextSql => TS}

  /** The ONE spelling of the clean chain's scored projection — shared by
    * [[cleanSql]], [[AssembleSql]], and [[CurateSql]] so a composite's
    * gates can never drift from the standalone chain's (the r14
    * self-review lesson, applied to the r15 composites).
    */
  val scoredColsSql: String =
    s"""${TS.langPredict("text")} AS lang_pred,
       |    ${TextAnalysisSql.qualityScoreSql("text")} AS quality,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens""".stripMargin

  /** The gate predicate, one spelling. */
  val gateWhereSql: String =
    s"lang_pred = lang AND quality >= ${CleanCorpus.QualityMin}"

  /** The dedup winner window, one spelling. */
  val dedupRnSql: String =
    "row_number() OVER (PARTITION BY md5(trim(text)) ORDER BY doc_id)"

  /** Oracle for the streaming twin's certified surface: the dedup ledger of
    * the gated corpus (same gates, grouped by content hash).
    */
  val cleanLedgerSql: String =
    s"""WITH gated AS (
       |  SELECT doc_id, md5(trim(text)) AS content_hash
       |  FROM documents
       |  WHERE ${TS.langPredict("text")} = lang
       |    AND ${TextAnalysisSql.qualityScoreSql("text")} >= ${CleanCorpus.QualityMin})
       |SELECT content_hash, min(doc_id) AS keep_id,
       |  CAST(count(*) AS BIGINT) AS n_copies
       |FROM gated GROUP BY content_hash
       |ORDER BY content_hash""".stripMargin

  val cleanSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |    $scoredColsSql
       |  FROM documents),
       |gated AS (
       |  SELECT doc_id, lang, text, quality, n_tokens FROM scored
       |  WHERE $gateWhereSql),
       |dedup AS (
       |  SELECT doc_id, lang, quality, n_tokens,
       |    $dedupRnSql AS rn,
       |    count(*) OVER (PARTITION BY md5(trim(text))) AS n_copies
       |  FROM gated)
       |SELECT doc_id, lang, quality, n_tokens, CAST(n_copies AS BIGINT) AS n_copies,
       |  ${TextAnalysisSql.splitAssignSql("doc_id")} AS split
       |FROM dedup WHERE rn = 1
       |ORDER BY doc_id""".stripMargin
}
