package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Oversample
import graft.sources.Tables

/** Streaming twin of [[Oversample]]: the corpus arrives as file
  * micro-batches while the per-source TOKEN MASS — the input to the
  * replication factors — updates incrementally: the "how under-
  * represented is source X right now?" signal a live mixture owner
  * watches without re-reading the corpus.
  *
  * The incremental side is the one aggregate the factor table needs:
  * per-source token sums as an update-mode streaming aggregation,
  * monotone nondecreasing (token counts are positive), folded by row MAX
  * on readback — the [[StreamingInterleave]] discipline; state is one
  * counter per source. The manifest materialization reuses
  * [[Oversample.manifestFromSourceTokens]] verbatim over the staged
  * corpus. Certified against the SAME oracle as the batch form;
  * chunking-invariance pinned in StreamingOversampleSpec.
  */
object StreamingOversample {

  /** Driver query: same manifest as `pipeline_oversample`, with the
    * per-source token sums built from `chunks` file micro-batches.
    */
  def manifestFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs.select(col("doc_id"), col("source"), col("text")), chunks,
      statePartitions = 4, prefix = "oversample_file",
      outputMode = "update", col("doc_id")) { stream =>
      stream.select(col("source"),
          TF.nTokens(col("text")).cast("long").as("n_tokens"))
        .groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    }
    val srcTokens = emissions.groupBy(col("source"))
      .agg(max(col("src_tokens")).as("src_tokens"))
    Oversample.manifestFromSourceTokens(Oversample.toksOf(docs), srcTokens)
  }
}
