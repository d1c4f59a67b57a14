package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextSql => TS}
import graft.sources.Tables

/** Collocation extraction — the corpus-analysis step behind tokenizer
  * vocabulary curation and phrase-aware chunking: the token pairs whose
  * co-occurrence is most above chance, ranked by pointwise mutual
  * information PMI(w₁,w₂) = ln(c₁₂·N / (c₁·c₂)) over adjacent-pair
  * counts. A high-PMI pair ("new york") is a unit the tokenizer should
  * not split; a low-PMI frequent pair is syntax, not a phrase. The
  * [[MinPairCount]] floor drops the rare-pair noise PMI is notorious for
  * (a pair seen once between two hapaxes maxes the score).
  *
  * The bigram stage IS [[BigramSurprisal.bigrams]] verbatim (one spelling
  * of pair extraction across the bigram family).
  *
  * Scale shape: the only data-sized shuffle is the pair count (map-side
  * combined); both marginals derive from the ALREADY AGGREGATED pair
  * table (vocabulary-sized, no second corpus pass); N joins in as a
  * broadcast SINGLE-ROW aggregate of that same table (the text_tfidf
  * shape — one counted nested-loop row); the final top-k is
  * TakeOrdered, never a global sort materialization.
  *
  * Exactness: ln evaluated once per DISTINCT surviving pair on the
  * vocabulary-sized table with all four factors cast to DOUBLE in one
  * fixed association — IEEE multiply/divide is deterministic, so both
  * engines floor the same micro value (the Surprisal boundary trade);
  * ties in pmi_micro rank by (w1, w2).
  */
object Collocations {

  /** Pairs seen fewer times than this are dropped before scoring. */
  val MinPairCount = 5L

  /** Collocations reported. */
  val TopK = 100

  /** (w1, w2, n_pair, pmi_micro): the [[TopK]] strongest collocations. */
  def top(docs: DataFrame): DataFrame =
    scoreTail(BigramSurprisal.bigrams(docs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair")))

  /** The PMI scoring tail over any (w1, w2, n_pair) pair-count table —
    * shared with [[graft.streaming.StreamingCollocations]] (the streaming
    * twin folds its incremental counts into exactly this table).
    *
    * The pair table has FOUR consumers (N, both marginals, the scored
    * base), so it is cached — without it each consumer replays the
    * corpus-sized bigram pass (observed: 4× the exchanges in the plan).
    */
  private[graft] def scoreTail(pc0: DataFrame): DataFrame = {
    val pc = Caching.cached(pc0)
    val n = pc.agg(sum(col("n_pair")).as("__n"))
    val c1 = pc.groupBy(col("w1")).agg(sum(col("n_pair")).as("c1"))
    val c2 = pc.groupBy(col("w2")).agg(sum(col("n_pair")).as("c2"))
    pc.filter(col("n_pair") >= MinPairCount)
      .join(c1, Seq("w1")).join(c2, Seq("w2")).join(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"),
        floor(log((col("n_pair").cast("double") * col("__n").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(TopK)
  }

  /** Driver query: top collocations of the documents corpus. */
  def topDocuments(spark: SparkSession, dir: String): DataFrame =
    top(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Collocations]] — same pair extraction, same
  * min-count floor, same double association inside the floored micro ln,
  * same (pmi desc, w1, w2) total order.
  */
object CollocationsSql {

  val topDocumentsSql: String =
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
       |pc AS (SELECT w1, w2, count(*) AS n_pair FROM bg
       |       WHERE w2 IS NOT NULL GROUP BY 1, 2),
       |n AS (SELECT CAST(sum(n_pair) AS BIGINT) AS nn FROM pc),
       |c1 AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS c1 FROM pc GROUP BY 1),
       |c2 AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS c2 FROM pc GROUP BY 1)
       |SELECT pc.w1, pc.w2, pc.n_pair,
       |  CAST(floor(ln((CAST(n_pair AS DOUBLE) * CAST(nn AS DOUBLE)) /
       |    (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1000000) AS BIGINT)
       |    AS pmi_micro
       |FROM pc JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
       |WHERE n_pair >= ${Collocations.MinPairCount}
       |ORDER BY pmi_micro DESC, w1, w2
       |LIMIT ${Collocations.TopK}""".stripMargin
}
