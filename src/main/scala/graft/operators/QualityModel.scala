package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Linear model-based quality classification — the "classifier filter"
  * stage of a pretraining pipeline (CCNet/fastText-style): a trained
  * linear model over token features, applied corpus-wide. Distinct from
  * [[TextAnalysis.quality]]'s closed-form heuristics in the shape that
  * matters at scale: the model's weights are a TABLE (a real vocabulary
  * runs to millions of terms — inline literals stop being a plan), so
  * scoring is exploded tokens x broadcast weight join x per-doc sum.
  *
  * Scale shape: tokens explode map-side and join the broadcast weight
  * table immediately — only MATCHED tokens (weight hits) survive to the
  * one doc-keyed shuffle, map-side-combined to one partial sum per doc
  * per task. Unmatched docs rejoin through a doc-keyed left join against
  * the narrow (doc_id, n_tokens) projection. The accept decision is pure
  * integer cross-multiplication (score * 1000 >= threshold * n_tokens) —
  * no division, so no floor-semantics divergence between engines and no
  * float boundary anywhere.
  *
  * The weights here are a FIXTURE standing in for trained parameters
  * (positive mass on function words — the same evidence
  * [[TextAnalysis.qualityFactors]]'s stopword factor uses — negative mass
  * on boilerplate/spam markers); the operator contract is the scoring
  * plan, not the particular parameters.
  */
object QualityModel {

  /** (term, weight in milli-units). Matching is on lowercased tokens. */
  val ModelWeights: Seq[(String, Long)] = Seq(
    "the" -> 40L, "and" -> 35L, "of" -> 30L, "to" -> 25L, "a" -> 20L,
    "is" -> 20L, "in" -> 15L, "that" -> 10L, "with" -> 10L, "for" -> 10L,
    "click" -> -120L, "free" -> -100L, "buy" -> -90L, "subscribe" -> -80L,
    "winner" -> -70L, "offer" -> -60L, "sale" -> -50L, "cheap" -> -40L)

  /** Accept iff mean token weight >= this many MICRO-units/token. */
  val ThresholdMicroPerToken = 5000L

  /** (doc_id, score_milli, n_tokens, accepted) for every document. */
  def score(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = ModelWeights.toDF("term", "weight_milli")
    val hits = docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .join(broadcast(weights), lower(col("token")) === col("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("weight_milli")).as("hit_milli"))
    docs.select(col("doc_id"), TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hit_milli"), lit(0L)).as("score_milli"),
        col("n_tokens"),
        (coalesce(col("hit_milli"), lit(0L)) * lit(1000L) >=
          lit(ThresholdMicroPerToken) * col("n_tokens")).as("accepted"))
  }

  /** Driver query: classifier decisions over the documents table. */
  def scoreDocuments(spark: SparkSession, dir: String): DataFrame =
    score(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[QualityModel]] — same weights, same tokenization,
  * same integer cross-multiplied decision.
  */
object QualityModelSql {

  val scoreDocumentsSql: String = {
    val values = QualityModel.ModelWeights
      .map { case (t, w) => s"('$t', ${w}::BIGINT)" }.mkString(", ")
    s"""WITH w(term, weight_milli) AS (VALUES $values),
       |toks AS (
       |  SELECT doc_id, lower(token) AS token FROM (
       |    SELECT doc_id, unnest(${TS.tokens("text")}) AS token
       |    FROM documents)
       |  WHERE token <> ''),
       |hits AS (
       |  SELECT doc_id, CAST(sum(weight_milli) AS BIGINT) AS hit_milli
       |  FROM toks JOIN w ON token = term GROUP BY doc_id),
       |base AS (
       |  SELECT doc_id, CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT b.doc_id, coalesce(h.hit_milli, 0) AS score_milli, b.n_tokens,
       |  (coalesce(h.hit_milli, 0) * 1000 >=
       |    ${QualityModel.ThresholdMicroPerToken} * b.n_tokens) AS accepted
       |FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }
}
