package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-source character-class profile — the OCR/encoding-noise detector
  * read next to the quality gate: the ppm split of every source's bytes
  * into letters, digits, whitespace, and other (punctuation/symbols). A
  * crawl slice whose "other" share spikes is mojibake or markup; a
  * digit-heavy source is tables, not prose.
  *
  * Scale shape: per-row class counts are four codegen'd regexp_replace
  * lengths in one narrow projection; ONE map-side-combined fold to
  * |sources| rows. Exactness: integer counts, ppm `div` of class sums
  * over the char total (shares sum to 1e6 minus ≤ 3 floor deficits).
  */
object CharClass {

  /** (source, n_chars, alpha_ppm, digit_ppm, space_ppm, other_ppm). */
  def profile(docs: DataFrame): DataFrame = {
    def classLen(re: String) =
      length(regexp_replace(col("text"), re, "")).cast("long")
    docs
      .select(col("source"), length(col("text")).cast("long").as("nc"),
        classLen("[^a-zA-Z]").as("al"), classLen("[^0-9]").as("dg"),
        classLen("[^ ]").as("sp"))
      .groupBy(col("source"))
      .agg(sum(col("nc")).as("n_chars"), sum(col("al")).as("__a"),
        sum(col("dg")).as("__d"), sum(col("sp")).as("__s"))
      .select(col("source"), col("n_chars"),
        expr("(__a * 1000000) div n_chars").as("alpha_ppm"),
        expr("(__d * 1000000) div n_chars").as("digit_ppm"),
        expr("(__s * 1000000) div n_chars").as("space_ppm"),
        expr("((n_chars - __a - __d - __s) * 1000000) div n_chars")
          .as("other_ppm"))
      .orderBy(col("source"))
  }

  /** Driver query: the character-class profile of the documents corpus. */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[CharClass]] — same class regexes (global
  * replace), same integer folds.
  */
object CharClassSql {

  val profileDocumentsSql: String = {
    def classLen(re: String) =
      s"CAST(length(regexp_replace(text, '$re', '', 'g')) AS BIGINT)"
    s"""WITH per AS (
       |  SELECT source, CAST(length(text) AS BIGINT) AS nc,
       |    ${classLen("[^a-zA-Z]")} AS al,
       |    ${classLen("[^0-9]")} AS dg,
       |    ${classLen("[^ ]")} AS sp
       |  FROM documents),
       |agg AS (
       |  SELECT source, CAST(sum(nc) AS BIGINT) AS n_chars,
       |    CAST(sum(al) AS BIGINT) AS a, CAST(sum(dg) AS BIGINT) AS d,
       |    CAST(sum(sp) AS BIGINT) AS s
       |  FROM per GROUP BY 1)
       |SELECT source, n_chars,
       |  (a * 1000000) // n_chars AS alpha_ppm,
       |  (d * 1000000) // n_chars AS digit_ppm,
       |  (s * 1000000) // n_chars AS space_ppm,
       |  ((n_chars - a - d - s) * 1000000) // n_chars AS other_ppm
       |FROM agg ORDER BY source""".stripMargin
  }
}
