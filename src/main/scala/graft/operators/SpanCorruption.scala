package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic span-corruption schedule — the T5-style masking plan
  * materialized as data: each document's token stream is tiled into
  * fixed-length spans and each span is masked by a salted hash draw at
  * the target rate, so every epoch, worker, and replay masks the SAME
  * spans (reproducible pretraining) without any RNG state to ship.
  *
  * Scale shape: one narrow projection computing the token count per
  * row, one span-id explode (n/L rows per document — the only
  * data-shaped intermediate, map-side folded straight back to one row
  * per document), a zero-span left join to keep token-less documents.
  * No joins besides that corpus-keyed one, no windows.
  *
  * Exactness: span draws are the shared salted [[TF.hash60]] on the
  * (doc_id, span_id) pair; `pmod` keeps the draw non-negative in both
  * engines; counts, `least`, and ppm `div` are integer.
  */
object SpanCorruption {

  /** Tokens per span. */
  val SpanLen = 3

  /** Masked spans per 1000 (the T5 ~15% rate). */
  val MaskPerMille = 150

  val SpanSalt = "span:"

  /** (doc_id, n_tokens, n_spans, n_masked_spans, n_masked_tokens,
    * mask_ppm) per document.
    */
  def schedule(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
      .withColumn("n_spans",
        expr(s"(n_tokens + ${SpanLen - 1}) div $SpanLen"))
    val spans = base.filter(col("n_spans") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("span_id"))
      .withColumn("masked",
        when(pmod(TF.hash60(concat(lit(SpanSalt),
          col("doc_id").cast("string"), lit(":"),
          col("span_id").cast("string"))), lit(1000L)) < MaskPerMille, 1L)
          .otherwise(0L))
      .withColumn("span_tokens",
        least(lit(SpanLen.toLong), col("n_tokens") - col("span_id") * SpanLen))
      .groupBy(col("doc_id"))
      .agg(sum(col("masked")).as("n_masked_spans"),
        sum(col("masked") * col("span_tokens")).as("n_masked_tokens"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        coalesce(col("n_masked_spans"), lit(0L)).as("n_masked_spans"),
        coalesce(col("n_masked_tokens"), lit(0L)).as("n_masked_tokens"),
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr("(coalesce(n_masked_tokens, 0L) * 1000000) div n_tokens"))
          .as("mask_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Driver query: the masking schedule of the documents corpus. */
  def scheduleDocuments(spark: SparkSession, dir: String): DataFrame =
    schedule(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[SpanCorruption]] — same salted draw, same span
  * tiling, same integer folds.
  */
object SpanCorruptionSql {
  import SpanCorruption._

  val scheduleDocumentsSql: String = {
    val hv = TS.hash60(
      s"('$SpanSalt' || CAST(doc_id AS VARCHAR) || ':' || CAST(span_id AS VARCHAR))")
    s"""WITH base AS (
       |  SELECT doc_id, CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens,
       |    (CAST(${TS.nTokens("text")} AS BIGINT) + ${SpanLen - 1})
       |      // $SpanLen AS n_spans
       |  FROM documents),
       |spans AS (
       |  SELECT doc_id, n_tokens,
       |    unnest(range(n_spans)) AS span_id
       |  FROM base WHERE n_spans > 0),
       |drawn AS (
       |  SELECT doc_id,
       |    CASE WHEN (($hv % 1000) + 1000) % 1000 < $MaskPerMille
       |         THEN 1 ELSE 0 END AS masked,
       |    least($SpanLen, n_tokens - span_id * $SpanLen) AS span_tokens
       |  FROM spans),
       |agg AS (
       |  SELECT doc_id, CAST(sum(masked) AS BIGINT) AS n_masked_spans,
       |    CAST(sum(masked * span_tokens) AS BIGINT) AS n_masked_tokens
       |  FROM drawn GROUP BY 1)
       |SELECT b.doc_id, b.n_tokens, b.n_spans,
       |  COALESCE(a.n_masked_spans, 0) AS n_masked_spans,
       |  COALESCE(a.n_masked_tokens, 0) AS n_masked_tokens,
       |  CASE WHEN b.n_tokens = 0 THEN 0
       |       ELSE (COALESCE(a.n_masked_tokens, 0) * 1000000) // b.n_tokens
       |  END AS mask_ppm
       |FROM base b LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
