package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.TokenEntropy
import graft.sources.Tables

/** Streaming twin of [[TokenEntropy]]: the corpus arrives as file-source
  * micro-batches and the per-source vocabulary builds incrementally, so
  * the diversity profile refreshes as ingest proceeds.
  *
  * The incremental side is an update-mode (source, token) count.
  * Cumulative counts are monotone nondecreasing, so the readback folds
  * each key by max (the [[StreamingCorpusDrift]] discipline) and the
  * ln-weighted scoring tail is [[TokenEntropy.profileOfVocab]] VERBATIM
  * on the folded table — certified against the SAME oracle as the batch
  * form.
  *
  * State: one counter per live (source, token) — the per-source
  * vocabulary, the operator's own intermediate, not corpus-sized.
  */
object StreamingTokenEntropy {

  /** Driver query: same profile as `text_entropy`, with the corpus
    * consumed as `chunks` real file-source micro-batches.
    */
  def profileFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs, chunks, statePartitions = 4,
      prefix = "entropy_file", outputMode = "update", col("doc_id")) { stream =>
      stream
        .select(col("source"), explode(TF.tokens(col("text"))).as("__raw"))
        .select(col("source"), lower(col("__raw")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("tf"))
    }
    TokenEntropy.profileOfVocab(emissions
      .groupBy(col("source"), col("token"))
      .agg(max(col("tf")).as("tf")))
  }
}
