package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Dataset card — the "Datasheets for Datasets" summary every published
  * training corpus ships with: corpus size (docs/tokens/chars), diversity
  * (distinct sources/languages), exact-duplication rate, and the
  * content-addressed split sizes, as one (section, stat, value) report.
  *
  * Every stat reuses the engine's certified spellings: the token count is
  * [[TF.nTokens]], the duplicate key is `md5(trim(text))` ([[Dedup.exact]]'s
  * convention), and the split assignment is [[TextAnalysis.splitAssign]]
  * verbatim — so the card can never disagree with the operators it
  * summarizes.
  *
  * Scale shape: ONE corpus pass. The three exact distincts (source, lang,
  * content hash) plan as a single Expand (×4 narrow rows — the hash
  * shuffles, never the text), the split counts are conditional sums of a
  * pure doc_id function inside the same aggregate, and the final unpivot
  * is a generator over ONE aggregated row.
  */
object DatasetCard {

  /** (section, stat, value): the corpus datasheet. */
  def card(docs: DataFrame): DataFrame = {
    val split = TextAnalysis.splitAssign(col("doc_id"))
    val one = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(TF.nTokens(col("text")).cast("long")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(md5(trim(col("text")))).as("n_distinct_texts"),
      sum(when(split === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(split === "valid", 1L).otherwise(0L)).as("n_valid"),
      sum(when(split === "test", 1L).otherwise(0L)).as("n_test"))
    one.selectExpr("stack(10, " +
        "'dedup', 'n_distinct_texts', n_distinct_texts, " +
        "'dedup', 'n_dup_docs', n_docs - n_distinct_texts, " +
        "'diversity', 'n_langs', n_langs, " +
        "'diversity', 'n_sources', n_sources, " +
        "'size', 'n_docs', n_docs, " +
        "'size', 'total_chars', total_chars, " +
        "'size', 'total_tokens', total_tokens, " +
        "'split', 'n_test', n_test, " +
        "'split', 'n_train', n_train, " +
        "'split', 'n_valid', n_valid" +
        ") AS (section, stat, value)")
      .orderBy(col("section"), col("stat"))
  }

  /** Driver query: the documents-table datasheet. */
  def cardDocuments(spark: SparkSession, dir: String): DataFrame =
    card(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[DatasetCard]] — the same certified spellings
  * (shared token/split/hash SQL), one aggregate unpivoted by UNION ALL.
  */
object DatasetCardSql {

  val cardDocumentsSql: String = {
    val split = TextAnalysisSql.splitAssignSql("doc_id")
    s"""WITH a AS (SELECT
       |    count(*) AS n_docs,
       |    CAST(sum(${TS.nTokens("text")}) AS BIGINT) AS total_tokens,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    count(DISTINCT source) AS n_sources,
       |    count(DISTINCT lang) AS n_langs,
       |    count(DISTINCT md5(trim(text))) AS n_distinct_texts,
       |    CAST(sum(CASE WHEN $split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |    CAST(sum(CASE WHEN $split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       |    CAST(sum(CASE WHEN $split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |  FROM documents)
       |SELECT 'dedup' AS section, 'n_distinct_texts' AS stat, n_distinct_texts AS value FROM a
       |UNION ALL SELECT 'dedup', 'n_dup_docs', n_docs - n_distinct_texts FROM a
       |UNION ALL SELECT 'diversity', 'n_langs', n_langs FROM a
       |UNION ALL SELECT 'diversity', 'n_sources', n_sources FROM a
       |UNION ALL SELECT 'size', 'n_docs', n_docs FROM a
       |UNION ALL SELECT 'size', 'total_chars', total_chars FROM a
       |UNION ALL SELECT 'size', 'total_tokens', total_tokens FROM a
       |UNION ALL SELECT 'split', 'n_test', n_test FROM a
       |UNION ALL SELECT 'split', 'n_train', n_train FROM a
       |UNION ALL SELECT 'split', 'n_valid', n_valid FROM a
       |ORDER BY section, stat""".stripMargin
  }
}
