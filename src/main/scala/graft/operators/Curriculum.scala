package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Length-banded curriculum order — the "short sequences first" training
  * schedule: every document lands in a token-count band
  * (band = min(n_tokens / [[BandTokens]], [[NumBands]]-1)), bands are
  * consumed easy→hard, and WITHIN a band the order is a salted
  * content-addressed permutation (the [[GlobalShuffle]] coin), so each
  * training window still mixes the band's full diversity instead of
  * crawling a strict length sort (which correlates every batch with
  * whatever length confounds).
  *
  * Scale shape: ONE range shuffle — the (band, hash, doc_id) order feeds
  * [[ContiguousId]]'s range-repartition + per-partition zipWithIndex
  * (one Long per partition crosses the driver), exactly the
  * [[GlobalShuffle]] position discipline; the token count and band are
  * pure projections on the first corpus pass.
  *
  * Determinism: (band, hv, doc_id) is a TOTAL order, so the schedule is
  * unique and the oracle certifies the entire permutation.
  */
object Curriculum {

  /** Tokens per curriculum band. */
  val BandTokens = 64L

  /** Bands; the last is open-ended (everything ≥ (NumBands-1)·BandTokens). */
  val NumBands = 8L

  val CurriculumSalt = "curr:"

  /** The ONE band spelling over a `n_tokens` column — shared with
    * [[LengthHistogram]] so the histogram prices exactly the bands the
    * schedule consumes.
    */
  private[operators] val BandExpr: String =
    s"least(n_tokens div $BandTokens, ${NumBands - 1L})"

  /** (doc_id, band, n_tokens, pos): the curriculum schedule. */
  def schedule(docs: DataFrame): DataFrame = {
    val banded = docs.select(col("doc_id"),
        TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .withColumn("band", expr(BandExpr))
      .withColumn("__hv", TF.hash60(concat(lit(CurriculumSalt),
        col("doc_id").cast("string"))))
    ContiguousId.assign(banded, "pos",
        Seq(col("band"), col("__hv"), col("doc_id")))
      .select(col("doc_id"), col("band"), col("n_tokens"), col("pos"))
  }

  /** Driver query: the curriculum schedule of the documents table. */
  def scheduleDocuments(spark: SparkSession, dir: String): DataFrame =
    schedule(Tables.documents(spark, dir)).orderBy(col("pos"))
}

/** DuckDB oracle for [[Curriculum]] — same band arithmetic, same salt,
  * same (band, hash, doc_id) total order.
  */
object CurriculumSql {

  /** The SQL band spelling over an n-tokens expression — one definition
    * shared with the length-histogram oracle.
    */
  private[operators] def bandSqlOf(n: String): String =
    s"least($n // ${Curriculum.BandTokens}, ${Curriculum.NumBands - 1L})"

  val scheduleDocumentsSql: String = {
    val hv = TS.hash60(s"('${Curriculum.CurriculumSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH b AS (
       |  SELECT doc_id,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens,
       |    ${bandSqlOf(s"CAST(${TS.nTokens("text")} AS BIGINT)")} AS band,
       |    $hv AS hv
       |  FROM documents)
       |SELECT doc_id, band, n_tokens,
       |       row_number() OVER (ORDER BY band, hv, doc_id) AS pos
       |FROM b ORDER BY pos""".stripMargin
  }
}
