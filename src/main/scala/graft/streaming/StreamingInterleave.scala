package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Interleave
import graft.sources.Tables

/** Streaming twin of [[Interleave]]: the corpus arrives as file
  * micro-batches (the crawl landing) while the per-source EXPOSURE
  * COUNTERS — how many documents each source will contribute to the
  * round-robin schedule — update incrementally: the "is the mixture
  * balanced yet?" signal a live ingestion watches without re-reading
  * the corpus.
  *
  * The incremental side is the one piece of the schedule that is
  * genuinely a running aggregate: per-source counts are an update-mode
  * streaming aggregation, monotone nondecreasing (documents only
  * arrive), so the final count is the row MAX of the emissions,
  * batch-order-independent — the [[StreamingBudgetSample]] /
  * [[StreamingCorpusDrift]] monotone-fold discipline. State is ONE
  * counter per source (|sources| rows), independent of corpus size.
  *
  * The schedule materialization over the folded counters reuses
  * [[Interleave.orderFromCounts]] verbatim — one spelling, no drift —
  * on the staged corpus read back from storage (the permutation itself
  * is a total order over ALL documents, so it is a batch product by
  * nature; what streams is the counter table that anchors its
  * per-source offsets). Certified against the SAME oracle as the batch
  * form; chunking-invariance pinned in StreamingInterleaveSpec.
  */
object StreamingInterleave {

  /** Driver query: same schedule as `pipeline_interleave`, with the
    * per-source exposure counters built from `chunks` real file-source
    * micro-batches.
    */
  def orderFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs.select(col("doc_id"), col("source")), chunks,
      statePartitions = 4, prefix = "interleave_file",
      outputMode = "update", col("doc_id")) { stream =>
      stream.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    }
    val counts = emissions.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"))
    Interleave.orderFromCounts(Interleave.hashedOf(docs), counts)
  }
}
