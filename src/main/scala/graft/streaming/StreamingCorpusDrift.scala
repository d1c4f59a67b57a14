package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusDrift
import graft.sources.Tables

/** Streaming twin of [[CorpusDrift]]: the NEW snapshot arrives as a
  * stream (the recrawl delta landing batch by batch) while the previous
  * snapshot is static — drift updates as the crawl ingests, so the
  * pre-retrain health check never needs a full re-read of the new corpus.
  *
  * The incremental side is a plain update-mode streaming
  * `groupBy(source, token).count()` over the in-stream tokenization
  * (narrow explode — built-in incremental aggregation, the
  * [[StreamingCms]] pattern). Cumulative counts are monotone
  * nondecreasing, so the final per-(source, token) count is the row max
  * of the emissions, batch-order-independent. The TV tail and the static
  * old-side counts reuse [[CorpusDrift]]'s exact expressions
  * ([[CorpusDrift.sideToks]] / [[CorpusDrift.tvTail]] — one spelling, no
  * drift possible), against the SAME oracle as the batch form.
  *
  * State: one counter per live (source, token) — vocabulary-scale, the
  * operator's own output domain (the exact-count analog of the sketch
  * twins' grid state; a deployment that cannot afford vocabulary state
  * streams the CMS grid instead and accepts estimate error).
  */
object StreamingCorpusDrift {

  /** Driver query: same drift as `pipeline_corpus_drift`, with the new
    * snapshot consumed as `chunks` real file-source micro-batches.
    */
  def driftFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, CorpusDrift.newCarve(docs), chunks, statePartitions = 4,
      prefix = "drift_file", outputMode = "update", col("doc_id")) { stream =>
      CorpusDrift.sideToks(stream)
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
    }
    val nCounts = emissions.groupBy(col("source"), col("token"))
      .agg(max(col("n")).as("n"))
    val oCounts = CorpusDrift.sideToks(CorpusDrift.oldCarve(docs))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("o"))
    val counts = oCounts.join(nCounts, Seq("source", "token"), "full_outer")
      .select(col("source"), col("token"),
        coalesce(col("o"), lit(0L)).as("o"),
        coalesce(col("n"), lit(0L)).as("n"))
    CorpusDrift.tvTail(counts).orderBy(col("source"))
  }
}
