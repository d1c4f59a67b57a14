package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic token-budget subsetting: keep documents, in a
  * content-addressed order, until each source's cumulative token count
  * reaches [[BudgetTokens]] — how a 100 TB corpus is actually cut down to
  * "N tokens per domain" for a training run (the SELECTING counterpart of
  * the `pipeline_token_budget` accounting report). Greedy-prefix
  * semantics: a document is kept iff its INCLUSIVE running token sum in
  * (salted hash, doc_id) order fits the budget.
  *
  * Scale shape — the per-source running sum WITHOUT a per-source data
  * window: the salted 60-bit hash is cut into [[NumBuckets]]
  * ORDER-PRESERVING range buckets (`hv div 2^48` — bucket order IS hash
  * order, unlike a modulo). One map-side-combined aggregation builds the
  * per-(source, bucket) token histogram; cumulative sums over that
  * histogram (histogram-sized window) classify each bucket as fully
  * inside the budget, fully outside, or THE boundary bucket — at most one
  * per source. Full buckets keep all their documents with no ranking;
  * only the boundary bucket's documents (corpus/4096 per source in
  * expectation) run an exact per-document cumulative sum, a window whose
  * partition is the boundary bucket, never the domain. Provably equal to
  * the windowed running-sum spelling the oracle runs.
  */
object BudgetSample {

  /** Per-source token budget. */
  val BudgetTokens = 600L

  /** Order-preserving hash-range buckets (hash60 is in [0, 2^60)). */
  val NumBuckets = 4096
  private val BucketShift = 48 // 2^60 / 2^48 = 4096 buckets

  val BudgetSalt = "budget:"

  /** (doc_id, source, n_tokens): the kept prefix per source. */
  def sample(docs: DataFrame): DataFrame =
    samplePreTokenized(docs.select(col("doc_id"), col("source"),
      TF.nTokens(col("text")).cast("long").as("n_tokens")))

  /** The salted priority hash + order-preserving range bucket of a
    * (doc_id, source, n_tokens) frame — ONE spelling shared by the batch
    * form and the streaming twin's in-stream projection.
    */
  private[graft] def hashedOf(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), col("source"), col("n_tokens"),
      TF.hash60(concat(lit(BudgetSalt), col("doc_id").cast("string")))
        .as("__hv"))
      .withColumn("__bucket", expr(s"__hv div ${1L << BucketShift}"))

  /** The prefix classification over a per-(source, bucket) token histogram
    * `hist(source, __bucket, btok)` plus the hashed doc frame — shared by
    * the batch form (histogram aggregated in-plan) and the streaming twin
    * (histogram folded from update-mode emissions), so the cutoff
    * arithmetic has exactly one spelling.
    */
  private[graft] def prefixFromHistogram(hashed: DataFrame,
      hist: DataFrame): DataFrame = {
    val wcum = Window.partitionBy(col("source")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = hist
      .withColumn("cum_end", sum(col("btok")).over(wcum))
      .withColumn("cum_start", col("cum_end") - col("btok"))
      .filter(col("cum_start") < BudgetTokens) // full + boundary buckets only
      .select(col("source"), col("__bucket"),
        (col("cum_end") <= BudgetTokens).as("full"), col("cum_start"))
    val joined = hashed.join(broadcast(flagged), Seq("source", "__bucket"))
    val fullKept = joined.filter(col("full"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
    // at most ONE boundary bucket per source: the exact doc-level prefix
    val wdoc = Window.partitionBy(col("source"), col("__bucket"))
      .orderBy(col("__hv"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = joined.filter(!col("full"))
      .withColumn("cum", col("cum_start") + sum(col("n_tokens")).over(wdoc))
      .filter(col("cum") <= BudgetTokens)
      .select(col("doc_id"), col("source"), col("n_tokens"))
    fullKept.unionAll(boundaryKept)
  }

  /** The prefix over an already-tokenized (doc_id, source, n_tokens)
    * frame — the seam composites with their own token accounting (e.g.
    * [[Curate]], whose counts come from the clean chain) reuse verbatim.
    */
  def samplePreTokenized(toks: DataFrame): DataFrame = {
    val hashed = Caching.cached(hashedOf(toks))
    val hist = hashed.groupBy(col("source"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
    prefixFromHistogram(hashed, hist)
  }

  /** Driver query: the budget-capped subset of the documents table. */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    sample(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[BudgetSample]] — the plain windowed running-sum
  * spelling the bucket construction is provably equivalent to.
  */
object BudgetSampleSql {
  import BudgetSample._

  /** The salted priority hash, one spelling. */
  val hvSql: String = TS.hash60(s"('$BudgetSalt' || CAST(doc_id AS VARCHAR))")

  /** The prefix tail over a CTE named `h(doc_id, source, n_tokens, hv)` —
    * ONE spelling shared with [[CurateSql]], whose token counts come from
    * the clean chain instead of the raw text.
    */
  val prefixTailSql: String =
    s"""c AS (
       |  SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY hv, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM h)
       |SELECT doc_id, source, n_tokens FROM c
       |WHERE cum <= $BudgetTokens ORDER BY doc_id""".stripMargin

  val sampleDocumentsSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens,
       |    $hvSql AS hv
       |  FROM documents),
       |$prefixTailSql""".stripMargin
}
