package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.BudgetSample
import graft.sources.Tables

/** Streaming twin of [[BudgetSample]]: the corpus arrives as file
  * micro-batches (the crawl landing) while the per-source token-budget
  * prefix updates incrementally — the "have we filled domain X's budget
  * yet?" signal a live ingestion pipeline watches without re-reading the
  * corpus.
  *
  * The incremental side is exactly the operator's scale trick: the
  * per-(source, bucket) token HISTOGRAM is an update-mode streaming
  * aggregation over the in-stream tokenization + salted-hash bucketing
  * ([[BudgetSample.hashedOf]] — the identical spelling, run inside the
  * micro-batch projection). Histogram sums are monotone nondecreasing
  * (token counts are positive), so the final per-bucket total is the row
  * MAX of the emissions, batch-order-independent — the
  * [[StreamingCorpusDrift]] monotone-fold discipline. State is one
  * counter per live (source, bucket): at most |sources| x 4096 rows,
  * INDEPENDENT of corpus size — the property that makes the budget watch
  * runnable against an unbounded crawl.
  *
  * The prefix classification over the folded histogram (cumulative bucket
  * sums, full/boundary flags, boundary-bucket-only doc ranking) reuses
  * [[BudgetSample.prefixFromHistogram]] verbatim — one spelling, no
  * drift — over the staged corpus read back from storage: at scale the
  * doc-level stage touches only the full + boundary buckets' documents
  * (the budget-sized head of each source), never re-scans the stream.
  * Certified against the SAME oracle as the batch form.
  */
object StreamingBudgetSample {

  /** Driver query: same kept prefix as `pipeline_budget_sample`, with the
    * histogram built from `chunks` real file-source micro-batches.
    */
  def sampleFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toksOf = (df: DataFrame) => df.select(col("doc_id"), col("source"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs.select(col("doc_id"), col("source"), col("text")), chunks,
      statePartitions = 4, prefix = "budget_file", outputMode = "update",
      col("doc_id")) { stream =>
      BudgetSample.hashedOf(toksOf(stream))
        .groupBy(col("source"), col("__bucket"))
        .agg(sum(col("n_tokens")).as("btok"))
    }
    val hist = emissions.groupBy(col("source"), col("__bucket"))
      .agg(max(col("btok")).as("btok"))
    val hashed = BudgetSample.hashedOf(toksOf(docs))
    BudgetSample.prefixFromHistogram(hashed, hist).orderBy(col("doc_id"))
  }
}
