package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Vocabulary growth curve (Heaps'-law instrument) — how fast the
  * corpus's distinct-token vocabulary grows as documents accumulate in
  * id order: the number a tokenizer owner reads before fixing a vocab
  * budget, and a drift signal when a new crawl bends the curve. The
  * corpus is cut into [[Bands]] equal doc_id bands; each band reports its
  * document/token mass, the token TYPES first seen there, and the
  * cumulative curve (docs_cum, tokens_cum, types_cum) — types_cum vs
  * tokens_cum is the empirical Heaps exponent's raw material.
  *
  * Scale shape: "first seen" is ONE map-side-combined min aggregation
  * over (token, doc_id) — never a sort or a window over the corpus; the
  * band histograms are |Bands|-row aggregates, and the cumulative window
  * runs over those [[Bands]] rows only. The max-id frame is a single-row
  * broadcast (counted cross-join pattern).
  *
  * Exactness: all-integer (counts, sums, non-negative `div` banding);
  * the tokenizer is the shared whitespace spelling ([[TF.tokens]] — the
  * '' token of an empty text is a type in both engines).
  */
object VocabGrowth {

  /** Number of equal doc_id bands the curve is sampled at. */
  val Bands = 8

  /** The per-token first-seen aggregation — ONE spelling shared by the
    * batch form (in-plan) and the streaming twin (update-mode, min-folded
    * on readback: min(doc_id) is monotone nonincreasing).
    */
  private[graft] def firstSeenOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("__first"))

  /** (band, n_docs, n_tokens, new_types, docs_cum, tokens_cum,
    * types_cum), ordered by band.
    */
  def growth(docs: DataFrame): DataFrame =
    growthFromFirstSeen(docs, firstSeenOf(docs))

  /** The band/cumulative tail from an externally-supplied (tok, __first)
    * table — shared verbatim by [[growth]] and the streaming twin.
    * `firstSeen` must hold exactly the per-token min doc_ids of `docs`.
    */
  private[graft] def growthFromFirstSeen(docs: DataFrame,
      firstSeen: DataFrame): DataFrame = {
    val maxId = docs.agg(max(col("doc_id")).as("__max"))
    val typeBands = firstSeen.crossJoin(broadcast(maxId))
      .select(expr(s"(__first * $Bands) div (__max + 1)").as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("new_types"))
    val docBands = docs.crossJoin(broadcast(maxId))
      .select(expr(s"(doc_id * $Bands) div (__max + 1)").as("band"),
        TF.nTokens(col("text")).cast("long").as("__n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
    // the cumulative window runs over <= Bands rows — single-partition by
    // construction, not by accident
    val w = Window.orderBy(col("band"))
    docBands.join(typeBands, Seq("band"), "left")
      .select(col("band"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("docs_cum", sum(col("n_docs")).over(w))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(w))
      .withColumn("types_cum", sum(col("new_types")).over(w))
      .orderBy(col("band"))
  }

  /** Driver query: the vocabulary growth curve of the documents corpus. */
  def growthDocuments(spark: SparkSession, dir: String): DataFrame =
    growth(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[VocabGrowth]] — same tokenizer, same banding
  * arithmetic, same cumulative window.
  */
object VocabGrowthSql {
  import VocabGrowth.Bands

  val growthDocumentsSql: String =
    s"""WITH mx AS (SELECT max(doc_id) AS mxid FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(${TS.tokens("text")}) AS tok
       |  FROM documents),
       |fs AS (SELECT tok, min(doc_id) AS first_seen FROM tok GROUP BY tok),
       |tb AS (
       |  SELECT (first_seen * $Bands) // (mxid + 1) AS band,
       |    count(*) AS new_types
       |  FROM fs, mx GROUP BY 1),
       |db AS (
       |  SELECT (doc_id * $Bands) // (mxid + 1) AS band,
       |    count(*) AS n_docs,
       |    CAST(sum(${TS.nTokens("text")}) AS BIGINT) AS n_tokens
       |  FROM documents, mx GROUP BY 1),
       |j AS (
       |  SELECT db.band, db.n_docs, db.n_tokens,
       |    coalesce(tb.new_types, 0) AS new_types
       |  FROM db LEFT JOIN tb ON db.band = tb.band)
       |SELECT band, n_docs, n_tokens, new_types,
       |  CAST(sum(n_docs) OVER (ORDER BY band) AS BIGINT) AS docs_cum,
       |  CAST(sum(n_tokens) OVER (ORDER BY band) AS BIGINT) AS tokens_cum,
       |  CAST(sum(new_types) OVER (ORDER BY band) AS BIGINT) AS types_cum
       |FROM j
       |ORDER BY band""".stripMargin
}
