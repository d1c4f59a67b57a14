package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Quantize
import graft.sources.Tables

/** Streaming twin of [[Quantize.int8]] — quantize-on-ingest: symmetric
  * int8 quantization is PER-VECTOR (each row's scale is its own max|v| /
  * 127), so new vectors quantize the moment they arrive with the batch
  * operator's spelling VERBATIM — stateless, append-mode, nothing to
  * freeze (like [[StreamingLshBuckets]], unlike the PQ/IVF twins whose
  * artifacts depend on a build-time codebook). This is the ingest path a
  * serving system actually runs: raw float vectors never land in the
  * store at all.
  *
  * Certified against the SAME DuckDB oracle as `emb_quantize`; chunking
  * invariance pinned in StreamingQuantizeSpec.
  */
object StreamingQuantize {

  /** Driver query: same (vec_id, n_dims, scale, q_hash) rows as
    * `emb_quantize`, with the corpus arriving as `chunks` file
    * micro-batches.
    */
  def int8FromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, emb.select(col("vec_id"), col("embedding")), chunks,
      statePartitions = 4, prefix = "quantize_file",
      outputMode = "append", col("vec_id")) { stream =>
      Quantize.int8(stream)
    }
    emissions.orderBy(col("vec_id"))
  }
}
