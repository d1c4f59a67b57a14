package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Conditional bigram surprisal — the fluency proxy one step up the LM
  * ladder from [[Surprisal]]'s unigram score: score(doc) = Σ over
  * adjacent token pairs of ln(c(w₁·) / c(w₁w₂)), the corpus itself as the
  * bigram model. Word salad scores high (its transitions are corpus-rare
  * even when its words are common — the signal unigram surprisal cannot
  * see); boilerplate scores low. `c(w₁·)` counts bigram OCCURRENCES
  * starting with w₁, so each conditional is a true probability.
  *
  * Exactness: [[Surprisal]]'s discipline verbatim — ln evaluated once per
  * DISTINCT bigram on the vocabulary-sized pair table, floored to micro
  * units there, and per-document totals are INTEGER sums of those micro
  * values. The 1-ulp ln residual is the same accepted trade, observable
  * via the boundary audit ([[graft.operators]] SurprisalBoundarySpec's
  * bigram case).
  *
  * Scale shape: bigrams via one codegen'd `lead()` over the per-doc
  * window (the boilerplate-strip lesson — never the array-lambda
  * shingle); the pair count is the one data-sized map-side-combined
  * shuffle; the first-token marginal derives from the ALREADY AGGREGATED
  * pair table (vocabulary-sized, no second corpus pass); scoring joins
  * occurrences to the pair scores by hash join into a doc-keyed
  * map-side-combined sum.
  */
object BigramSurprisal {

  /** The per-doc adjacent-pair table — shared with [[Collocations]] (the
    * composite discipline: one spelling of the bigram extraction; the
    * streaming twin's per-row spelling is pinned against this one in
    * StreamingCollocationsSpec).
    */
  private[graft] def bigrams(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), lower(col("col")).as("w1"))
      .filter(length(col("w1")) > 0)
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("w2", lead(col("w1"), 1).over(wdoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"), col("w2"))
  }

  /** (doc_id, n_bigrams, surprisal_micro) for every document. */
  def score(docs: DataFrame): DataFrame = {
    val bg = bigrams(docs)
    val pairCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val firstCounts = pairCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val scored = pairCounts.join(firstCounts, Seq("w1"))
      .select(col("w1"), col("w2"),
        floor(log(col("c1").cast("double") / col("c12")) * 1e6)
          .cast("long").as("s_micro"))
    val perDoc = bg.join(scored, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("s_micro")).as("surprisal_micro"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_micro"), lit(0L)).as("surprisal_micro"))
  }

  /** Driver query: bigram surprisal over the documents table. */
  def scoreDocuments(spark: SparkSession, dir: String): DataFrame =
    score(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[BigramSurprisal]] — same bigram extraction, same
  * per-distinct-pair floored micro ln, same integer sums.
  */
object BigramSurprisalSql {

  val scoreDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, pos, lower(w1) AS w1 FROM (
       |    SELECT doc_id, unnest(${TS.tokens("text")}) AS w1,
       |           generate_subscripts(${TS.tokens("text")}, 1) AS pos
       |    FROM documents)
       |  WHERE w1 <> ''),
       |bg AS (
       |  SELECT doc_id, w1,
       |    lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM toks),
       |pairs AS (
       |  SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
       |pc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
       |fc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pc GROUP BY 1),
       |scored AS (
       |  SELECT pc.w1, pc.w2,
       |    CAST(floor(ln(CAST(c1 AS DOUBLE) / c12) * 1000000) AS BIGINT)
       |      AS s_micro
       |  FROM pc JOIN fc USING (w1)),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(sum(s_micro) AS BIGINT) AS surprisal_micro
       |  FROM pairs JOIN scored USING (w1, w2) GROUP BY 1)
       |SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
       |  coalesce(p.surprisal_micro, 0) AS surprisal_micro
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
