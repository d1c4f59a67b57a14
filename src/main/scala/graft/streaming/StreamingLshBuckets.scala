package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Streaming twin of [[Similarity.lshBucketIndex]] — incremental
  * maintenance of the LSH bucket artifact: new vectors stream in as file
  * micro-batches and emit their (vec_id, bk) bucket rows on arrival. The
  * sign-LSH planes are DETERMINISTIC constants (data-independent by
  * construction — [[Similarity.tableBucket]]'s plane sequence), so unlike
  * the PQ twin there is nothing to freeze and nothing to respell: the
  * stream side runs [[Similarity.lshBuckets]]'s projection VERBATIM,
  * stateless, append-mode, whole-stage-codegen. This is the property that
  * makes sign-LSH the easiest ANN index to maintain under corpus growth,
  * and this twin certifies it.
  *
  * Certified against the SAME DuckDB oracle as `ann_lsh_buckets`;
  * chunking invariance pinned in StreamingLshBucketsSpec.
  */
object StreamingLshBuckets {

  /** Driver query: same (vec_id, bk) index as `ann_lsh_buckets`, with the
    * corpus arriving as `chunks` file micro-batches.
    */
  def bucketsFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, emb.select(col("vec_id"), col("embedding")), chunks,
      statePartitions = 4, prefix = "lsh_buckets_file",
      outputMode = "append", col("vec_id")) { stream =>
      Similarity.lshBuckets(stream)
    }
    emissions.orderBy(col("vec_id"), col("bk"))
  }
}
