package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LengthHistogram
import graft.sources.Tables

/** Streaming twin of [[LengthHistogram]]: the corpus arrives as file
  * micro-batches while the per-(source, band) doc/token counters update
  * incrementally — the live view of how each source's length
  * distribution is filling in as a crawl lands, watched without
  * re-reading the corpus.
  *
  * The incremental side is [[LengthHistogram.bandCounts]] VERBATIM as an
  * update-mode streaming aggregation; both counters are monotone
  * nondecreasing, so the final table is the row MAX of the emissions —
  * the monotone-fold discipline; state is |sources| x bands counters,
  * independent of corpus size. The within-source share tail
  * ([[LengthHistogram.withShares]]) runs on the folded band table.
  * Certified against the SAME oracle as the batch form;
  * chunking-invariance pinned in StreamingLengthHistogramSpec.
  */
object StreamingLengthHistogram {

  /** Driver query: same histogram as `pipeline_length_histogram`, built
    * incrementally from `chunks` file micro-batches.
    */
  def histogramFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs.select(col("doc_id"), col("source"), col("text")), chunks,
      statePartitions = 4, prefix = "lenhist_file",
      outputMode = "update", col("doc_id")) { stream =>
      LengthHistogram.bandCounts(stream)
    }
    LengthHistogram.withShares(
      emissions.groupBy(col("source"), col("band"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("n_tokens")).as("n_tokens")))
  }
}
