package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Corpus mixture rebalancing — the "data mixture" step of training-set
  * assembly: derive per-language keep rates FROM the corpus itself so the
  * sampled output approaches a target token share per language, then gate
  * each document through a deterministic content-addressed coin.
  *
  * This differs from [[TextAnalysis.sampleStratified]] (fixed, data-blind
  * rates): here the rate is `min(1, target_share · total_tokens /
  * lang_tokens)` — an over-represented language is downsampled toward its
  * target share while under-represented ones keep everything (capped at 1,
  * i.e. this operator downsamples, never upsamples). Rates are integer ppm
  * (`div` arithmetic, BIGINT end-to-end) and the keep decision is
  * `hash60(salt ‖ doc_id) % 1e6 < rate_ppm` — a pure function of doc_id,
  * reproducible across runs, engines, and cluster sizes.
  *
  * Scale shape: two passes over a NARROW (id, lang, token-count)
  * projection, never the text after tokenizing — pass 1 is a
  * map-side-combined agg to one row per language; the rate derivation runs
  * on language-cardinality rows (window over ~5 rows); pass 2 re-joins the
  * rates by broadcast and aggregates kept counts per language. No
  * data-sized shuffle anywhere: both aggs combine to |langs| partials per
  * task.
  */
object Mixture {

  /** Equal target token share per language, in ppm of the output mixture.
    * The synthetic corpus is ~36% `en` by tokens, so an equal 5-way target
    * downsamples `en` (rate < 1e6) and keeps the rest whole (capped) —
    * both branches of the rate formula are exercised at every test scale.
    */
  val TargetSharePpm = 200000L
  val Salt = "mix:"

  def rebalance(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
    val rates = toks.groupBy("lang")
      .agg(sum("n_tokens").as("lang_tokens"))
      .withColumn("total_tokens", sum("lang_tokens")
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("lang"), col("lang_tokens"),
        expr(s"least(1000000L, ($TargetSharePpm * total_tokens) div lang_tokens)")
          .as("rate_ppm"))
    val coin = TF.hash60(concat(lit(Salt), col("doc_id").cast("string"))) % 1000000L
    toks.join(broadcast(rates), Seq("lang"))
      .withColumn("keep", coin < col("rate_ppm"))
      .groupBy("lang")
      .agg(max("lang_tokens").as("lang_tokens"),
        max("rate_ppm").as("rate_ppm"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("lang")
  }

  /** Driver query: rebalance the documents corpus to equal language shares. */
  def rebalanceDocs(spark: SparkSession, dir: String): DataFrame =
    rebalance(Tables.documents(spark, dir))

  val TempSalt = "temp:"

  /** The alpha-0.5 rate: floor(1e6 · sqrt(min/n)) ppm — ONE spelling
    * shared by [[temperatureRebalance]] and the [[Assemble]] composite
    * (Scala and SQL), so the temperature recipe cannot drift between the
    * standalone operator and the pipeline that embeds it.
    */
  private[graft] def temperatureRatePpm(minTokens: Column, tokens: Column): Column =
    floor(lit(1000000.0) * sqrt(minTokens.cast("double") / tokens)).cast("long")

  private[graft] def temperatureRatePpmSql(minExpr: String, nExpr: String): String =
    s"CAST(floor(1000000.0 * sqrt(CAST($minExpr AS DOUBLE) / $nExpr)) AS BIGINT)"

  /** TEMPERATURE-scaled rebalancing at α = 0.5 — the multilingual
    * pretraining standard (target share ∝ n^α compresses the size
    * spectrum: rare languages upweighted relative to raw frequency,
    * dominant ones damped). Downsampling-only spelling: the smallest
    * language keeps everything and language l keeps
    * `floor(1e6 · sqrt(n_min / n_l))` ppm, so the OUTPUT token shares are
    * ∝ sqrt(n_l).
    *
    * Exactness: α = 0.5 is the one temperature whose pow is IEEE-exact —
    * `sqrt` is a correctly-rounded operation, so both engines produce the
    * bit-identical double from the identical integer ratio, and the single
    * multiply + floor after it are equally deterministic (a general pow(x,
    * 0.7) would carry a cross-engine libm risk the repo's exactness rule
    * rejects). Same narrow two-pass, language-cardinality-rate,
    * content-addressed-coin shape as [[rebalance]].
    */
  def temperatureRebalance(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
    val rates = toks.groupBy("lang")
      .agg(sum("n_tokens").as("lang_tokens"))
      .withColumn("min_tokens", min("lang_tokens")
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("lang"), col("lang_tokens"),
        temperatureRatePpm(col("min_tokens"), col("lang_tokens")).as("rate_ppm"))
    val coin = TF.hash60(concat(lit(TempSalt), col("doc_id").cast("string"))) % 1000000L
    toks.join(broadcast(rates), Seq("lang"))
      .withColumn("keep", coin < col("rate_ppm"))
      .groupBy("lang")
      .agg(max("lang_tokens").as("lang_tokens"),
        max("rate_ppm").as("rate_ppm"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("lang")
  }

  /** Driver query: temperature-sample the documents corpus at α = 0.5. */
  def temperatureRebalanceDocs(spark: SparkSession, dir: String): DataFrame =
    temperatureRebalance(Tables.documents(spark, dir))

  /** Mirror of [[temperatureRebalance]] — same salt, same sqrt spelling. */
  val temperatureRebalanceDocsSql: String = {
    val coin =
      s"${TS.hash60(s"('$TempSalt' || CAST(doc_id AS VARCHAR))")} % 1000000"
    s"""WITH toks AS (
       |  SELECT doc_id, lang, CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |langs AS (
       |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
       |  FROM toks GROUP BY 1),
       |rates AS (
       |  SELECT lang, lang_tokens,
       |    ${temperatureRatePpmSql("min(lang_tokens) OVER ()", "lang_tokens")}
       |      AS rate_ppm
       |  FROM langs)
       |SELECT t.lang, max(r.lang_tokens) AS lang_tokens,
       |  max(r.rate_ppm) AS rate_ppm,
       |  CAST(sum(CASE WHEN $coin < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_kept,
       |  CAST(sum(CASE WHEN $coin < r.rate_ppm THEN t.n_tokens ELSE 0 END)
       |    AS BIGINT) AS n_tokens_kept
       |FROM toks t JOIN rates r USING (lang)
       |GROUP BY t.lang ORDER BY t.lang""".stripMargin
  }

  /** Mirror of [[rebalance]] — same salt, target, and `//` (= `div`)
    * integer rate arithmetic; DuckDB's HUGEINT sums pinned to BIGINT.
    */
  val rebalanceDocsSql: String = {
    val coin =
      s"${TS.hash60(s"('$Salt' || CAST(doc_id AS VARCHAR))")} % 1000000"
    s"""WITH toks AS (
       |  SELECT doc_id, lang, CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |lt AS (
       |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
       |  FROM toks GROUP BY lang),
       |rates AS (
       |  SELECT lang, lang_tokens,
       |    least(1000000, ($TargetSharePpm *
       |      CAST(sum(lang_tokens) OVER () AS BIGINT)) // lang_tokens)
       |      AS rate_ppm
       |  FROM lt)
       |SELECT t.lang,
       |  max(r.lang_tokens) AS lang_tokens,
       |  CAST(max(r.rate_ppm) AS BIGINT) AS rate_ppm,
       |  CAST(sum(CASE WHEN $coin < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_kept,
       |  CAST(sum(CASE WHEN $coin < r.rate_ppm THEN t.n_tokens ELSE 0 END)
       |    AS BIGINT) AS n_tokens_kept
       |FROM toks t JOIN rates r USING (lang)
       |GROUP BY t.lang
       |ORDER BY lang""".stripMargin
  }
}
