package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Per-source readability profile — the lexical-complexity instrument a
  * curation pipeline reads next to the quality gate: word length, syllable
  * density, and long-word rate per source, the ingredients of the LIX /
  * Flesch-Kincaid family. The corpus carries NO sentence punctuation (the
  * driver documents are terminator-free — verified across scales), so the
  * sentence-length term of those indices is degenerate by construction;
  * this operator honestly reports the word-level terms only, which is the
  * part that differentiates sources here. Syllables use the standard
  * vowel-group proxy (runs of `[aeiouy]`, floor 1 per word) — the same
  * heuristic the readability literature uses when no dictionary is
  * available.
  *
  * Scale shape: one narrow projection (text + source off the scan), one
  * token explode, ONE map-side-combined shuffle collapsing to |sources|
  * rows; the distinct doc count rides the same aggregate (Spark plans the
  * mixed distinct/plain aggregate via Expand — still a single corpus
  * pass). No joins.
  *
  * Exactness: every aggregate is an integer count/sum; the three derived
  * rates are non-negative integer `div` (identical to DuckDB `//`), so no
  * doubles cross an aggregation anywhere.
  */
object Readability {

  /** Words at or above this many characters count as "long" (the LIX
    * convention).
    */
  val LongWordChars = 7

  /** (source, n_docs, n_words, wlen_milli, syll_per_kword, long_ppm):
    * mean word length (milli-chars), syllables per 1000 words, and
    * long-word rate (ppm), per source.
    */
  def profile(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("source"), col("doc_id"), explode(TF.tokens(col("text"))).as("w0"))
      .select(col("source"), col("doc_id"), lower(col("w0")).as("w"))
      .filter(length(col("w")) > 0)
    toks
      .select(col("source"), col("doc_id"), length(col("w")).as("chars"),
        greatest(lit(1),
          size(regexp_extract_all(col("w"), lit("[aeiouy]+"), lit(0))))
          .as("syll"),
        when(length(col("w")) >= LongWordChars, 1L).otherwise(0L).as("lng"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("chars").cast("long")).as("__chars"),
        sum(col("syll").cast("long")).as("__syll"),
        sum(col("lng")).as("__long"))
      .select(col("source"), col("n_docs"), col("n_words"),
        expr("(__chars * 1000) div n_words").as("wlen_milli"),
        expr("(__syll * 1000) div n_words").as("syll_per_kword"),
        expr("(__long * 1000000) div n_words").as("long_ppm"))
      .orderBy(col("source"))
  }

  /** Driver query: the readability profile of the documents corpus. */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Readability]] — same tokenization, same vowel-group
  * syllable proxy with the same floor, same integer rates.
  */
object ReadabilitySql {

  val profileDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT source, doc_id, lower(w0) AS w FROM (
       |    SELECT source, doc_id, unnest(${TS.tokens("text")}) AS w0
       |    FROM documents)
       |  WHERE w0 <> ''),
       |per_word AS (
       |  SELECT source, doc_id, length(w) AS chars,
       |    greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))) AS syll,
       |    CASE WHEN length(w) >= ${Readability.LongWordChars}
       |         THEN 1 ELSE 0 END AS lng
       |  FROM toks)
       |SELECT source, count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS n_words,
       |  (CAST(sum(chars) AS BIGINT) * 1000) // count(*) AS wlen_milli,
       |  (CAST(sum(syll) AS BIGINT) * 1000) // count(*) AS syll_per_kword,
       |  (CAST(sum(lng) AS BIGINT) * 1000000) // count(*) AS long_ppm
       |FROM per_word
       |GROUP BY source
       |ORDER BY source""".stripMargin
}
