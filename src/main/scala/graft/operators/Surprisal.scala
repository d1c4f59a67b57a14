package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Corpus-self unigram surprisal — the cheap LM-perplexity proxy quality
  * signal (a document whose tokens are all corpus-rare scores high;
  * boilerplate scores low): score(doc) = Σ over token occurrences of
  * ln(N / tf(token)), with the corpus itself as the unigram model.
  *
  * Exactness discipline: the ln is evaluated ONCE PER DISTINCT TOKEN on
  * the vocabulary table — both engines compute floor(1e6 · ln(N/tf)) on
  * identical integer pairs, so the residual 1-ulp ln risk is confined to
  * |vocab| evaluations (the [[Sketches.estimate]] trade, accepted there) —
  * and the per-document total is an INTEGER sum of those micro values,
  * immune to accumulation order. No float ever crosses an aggregation.
  *
  * Scale shape: one data-sized token aggregation (map-side combined) for
  * the vocabulary; the corpus total joins into the VOCAB projection as a
  * broadcast single row (vocab-sized work, the text_tfidf shape); scoring
  * is occurrences ⋈ vocab on the token key (hash join — a real vocabulary
  * outgrows a broadcast) into one doc-keyed map-side-combined sum.
  */
object Surprisal {

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("__raw"))
      .select(col("doc_id"), lower(col("__raw")).as("token"))
      .filter(length(col("token")) > 0)

  /** (doc_id, n_tokens, surprisal_micro) for every document (token-less
    * docs report 0/0).
    */
  def score(docs: DataFrame): DataFrame = {
    val t = toks(docs)
    val vocab = t.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("total"))
    val scored = vocab.join(broadcast(total))
      .select(col("token"),
        floor(log(col("total").cast("double") / col("tf")) * 1e6)
          .cast("long").as("s_micro"))
    val perDoc = t.join(scored, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("surprisal_micro"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_micro"), lit(0L)).as("surprisal_micro"))
  }

  /** Driver query: surprisal scores over the documents table. */
  def scoreDocuments(spark: SparkSession, dir: String): DataFrame =
    score(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[Surprisal]] — same tokenization, same per-distinct
  * floored micro ln, same integer sums.
  */
object SurprisalSql {

  val scoreDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lower(token) AS token FROM (
       |    SELECT doc_id, unnest(${TS.tokens("text")}) AS token
       |    FROM documents)
       |  WHERE token <> ''),
       |vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY 1),
       |total AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM vocab),
       |scored AS (
       |  SELECT token,
       |    CAST(floor(ln(CAST(total AS DOUBLE) / tf) * 1000000) AS BIGINT)
       |      AS s_micro
       |  FROM vocab, total),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    CAST(sum(s_micro) AS BIGINT) AS surprisal_micro
       |  FROM toks JOIN scored USING (token) GROUP BY 1)
       |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
       |  coalesce(p.surprisal_micro, 0) AS surprisal_micro
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
