package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Per-source sequence-length band histogram — the packing/curriculum
  * planning table: how each source's documents distribute over the SAME
  * token-count bands the curriculum schedule consumes
  * ([[Curriculum.BandExpr]], one spelling), with doc counts, token mass,
  * and each band's within-source doc share. Batch-size planners read
  * this before choosing pack lengths; curriculum owners read it to see
  * whether a band is starved.
  *
  * Scale shape: one narrow scan (tokenization is a projection), ONE
  * map-side-combined fold to |sources| x bands rows; the within-source
  * share is a window over the band-table rows, never the data.
  *
  * Exactness: counts and token sums are integers; shares are ppm `div`.
  */
object LengthHistogram {

  /** The per-(source, band) counting aggregation — shared verbatim with
    * [[graft.streaming.StreamingLengthHistogram]], where it runs as an
    * update-mode streaming aggregation (both counters are monotone
    * nondecreasing, so emissions fold by max).
    */
  private[graft] def bandCounts(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .withColumn("band", expr(Curriculum.BandExpr))
      .groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** The within-source share tail over the band table — shared with the
    * streaming twin's readback.
    */
  private[graft] def withShares(counts: DataFrame): DataFrame =
    counts
      .withColumn("__tot",
        sum(col("n_docs")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("band"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * 1000000) div __tot").as("doc_ppm"))
      .orderBy(col("source"), col("band"))

  /** (source, band, n_docs, n_tokens, doc_ppm), ordered. */
  def histogram(docs: DataFrame): DataFrame =
    withShares(bandCounts(docs))

  /** Driver query: the band histogram of the documents corpus. */
  def histogramDocuments(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[LengthHistogram]] — the same band spelling
  * ([[CurriculumSql.bandSqlOf]]), integer counts, ppm div.
  */
object LengthHistogramSql {

  val histogramDocumentsSql: String = {
    val n = s"CAST(${TS.nTokens("text")} AS BIGINT)"
    s"""WITH b AS (
       |  SELECT source, $n AS n_tokens,
       |    ${CurriculumSql.bandSqlOf(n)} AS band
       |  FROM documents),
       |h AS (
       |  SELECT source, band, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY 1, 2)
       |SELECT source, band, n_docs, n_tokens,
       |  (n_docs * 1000000) //
       |    CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS doc_ppm
       |FROM h ORDER BY source, band""".stripMargin
  }
}
