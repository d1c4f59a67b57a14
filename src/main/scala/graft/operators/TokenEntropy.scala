package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Per-source lexical-diversity profile — Shannon token entropy plus the
  * type-token and hapax rates, the standard instruments for "is this
  * source repetitive boilerplate or diverse prose" next to the quality
  * gate (a crawl dump whose entropy collapses is template spam; a source
  * whose hapax rate spikes is OCR noise).
  *
  * Entropy: H = Σ_t (tf/n)·ln(n/tf) over the source's unigram
  * distribution. Reported integer-exactly as
  * `entropy_micro = (Σ_t tf·s_micro) div n` with
  * `s_micro = floor(1e6·ln(n/tf))` — the ln evaluated ONCE PER DISTINCT
  * (source, token) on identical integer pairs in both engines (the
  * [[Surprisal]] discipline), the weighted sum pure integer and immune
  * to accumulation order. The div-by-n under-reports by < 1 micro-nat —
  * deterministically, identically on both engines.
  *
  * Scale shape: ONE corpus-sized map-side-combined aggregation to the
  * per-source vocabulary table (source, token, tf); everything after is
  * vocab-sized — per-source totals fold the vocab table to |sources|
  * rows and broadcast back, then one vocab-sized weighted sum collapses
  * to |sources| rows. No corpus re-read, no window, no driver loop.
  */
object TokenEntropy {

  /** The per-source vocabulary table (source, token, tf) — the stage the
    * streaming twin rebuilds incrementally.
    */
  private[graft] def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TF.tokens(col("text"))).as("__raw"))
      .select(col("source"), lower(col("__raw")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** (source, n_tokens, n_types, entropy_micro, ttr_ppm, hapax_ppm):
    * token entropy in micro-nats, type-token ratio in ppm of tokens,
    * hapax (tf = 1) share in ppm of types, per source.
    */
  def profile(docs: DataFrame): DataFrame = profileOfVocab(vocabOf(docs))

  /** The vocab-sized scoring tail — shared VERBATIM with
    * [[graft.streaming.StreamingTokenEntropy]] so both forms certify
    * against the same oracle.
    */
  private[graft] def profileOfVocab(vocab: DataFrame): DataFrame = {
    val totals = vocab.groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("__hapax"))
    vocab.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("__hapax"),
        (col("tf") *
          floor(log(col("n_tokens").cast("double") / col("tf")) * 1e6)
            .cast("long")).as("__w_micro"))
      .groupBy(col("source"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        first(col("n_types")).as("n_types"),
        first(col("__hapax")).as("__hapax"),
        sum(col("__w_micro")).as("__h_sum"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("__h_sum div n_tokens").as("entropy_micro"),
        expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
        expr("(__hapax * 1000000) div n_types").as("hapax_ppm"))
      .orderBy(col("source"))
  }

  /** Driver query: the lexical-diversity profile of the documents corpus. */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[TokenEntropy]] — same tokenization, same
  * once-per-distinct floored micro ln, same integer folds.
  */
object TokenEntropySql {

  val profileDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT source, lower(token) AS token FROM (
       |    SELECT source, unnest(${TS.tokens("text")}) AS token
       |    FROM documents)
       |  WHERE token <> ''),
       |vocab AS (
       |  SELECT source, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |totals AS (
       |  SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |    count(*) AS n_types,
       |    CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hapax
       |  FROM vocab GROUP BY 1),
       |weighted AS (
       |  SELECT v.source, t.n_tokens, t.n_types, t.hapax,
       |    v.tf * CAST(floor(ln(CAST(t.n_tokens AS DOUBLE) / v.tf)
       |                      * 1000000) AS BIGINT) AS w_micro
       |  FROM vocab v JOIN totals t USING (source))
       |SELECT source, n_tokens, n_types,
       |  CAST(sum(w_micro) AS BIGINT) // n_tokens AS entropy_micro,
       |  (n_types * 1000000) // n_tokens AS ttr_ppm,
       |  (hapax * 1000000) // n_types AS hapax_ppm
       |FROM weighted
       |GROUP BY source, n_tokens, n_types, hapax
       |ORDER BY source""".stripMargin
}
