package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Zipf rank-frequency decade profile — the log-log frequency curve
  * sampled at rank decades (ranks 1-9, 10-99, 100-999, ...): the
  * vocabulary-health instrument. A natural corpus shows the straight
  * ~slope−1 staircase; template spam flattens the head, OCR noise fattens
  * the tail — both readable directly from the per-decade type counts and
  * mass.
  *
  * Exactness: the decade is `len(CAST(rank AS VARCHAR)) − 1` — integer
  * log10 with no float anywhere; ranks over the (tf desc, token) total
  * order; counts and sums only.
  *
  * Scale shape: ONE corpus-sized map-side-combined aggregation to the
  * vocabulary table; ranking is [[ContiguousId]]'s range shuffle over
  * the vocab (never a single-partition global window — a 100 TB corpus
  * carries a vocabulary far past one task); the decade fold collapses to
  * ~log10(V) rows.
  */
object Zipf {

  /** (decade, n_types, sum_tf, max_tf, min_tf) per rank decade. */
  def decades(docs: DataFrame): DataFrame = {
    val vocab = docs
      .select(explode(TF.tokens(col("text"))).as("__raw"))
      .select(lower(col("__raw")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    ContiguousId.assign(vocab, "rank", Seq(col("tf").desc, col("token")))
      .select((length(col("rank").cast("string")) - 1).cast("long")
        .as("decade"), col("tf"))
      .groupBy(col("decade"))
      .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("sum_tf"),
        max(col("tf")).as("max_tf"), min(col("tf")).as("min_tf"))
      .orderBy(col("decade"))
  }

  /** Driver query: the Zipf decade profile of the documents corpus. */
  def decadesDocuments(spark: SparkSession, dir: String): DataFrame =
    decades(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Zipf]] — same tokenization, the row_number
  * spelling of the rank, the same string-length decade.
  */
object ZipfSql {

  val decadesDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT lower(token) AS token FROM (
       |    SELECT unnest(${TS.tokens("text")}) AS token FROM documents)
       |  WHERE token <> ''),
       |vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY 1),
       |ranked AS (
       |  SELECT tf, length(CAST(row_number()
       |    OVER (ORDER BY tf DESC, token) AS VARCHAR)) - 1 AS decade
       |  FROM vocab)
       |SELECT CAST(decade AS BIGINT) AS decade, count(*) AS n_types,
       |  CAST(sum(tf) AS BIGINT) AS sum_tf,
       |  max(tf) AS max_tf, min(tf) AS min_tf
       |FROM ranked
       |GROUP BY 1 ORDER BY decade""".stripMargin
}
