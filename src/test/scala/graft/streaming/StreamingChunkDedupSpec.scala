package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextChunk
import graft.sources.Tables

/** The two certification pins the respelled streaming twin needs: the
  * per-row chunk spelling equals the batch window spelling chunk-for-
  * chunk, and the streamed canonical assignment is chunking-invariant and
  * equal to the batch canonical rule.
  */
class StreamingChunkDedupSpec extends SparkSpec {

  test("the per-row chunk respelling equals TextChunk.chunk chunk-for-chunk") {
    val docs = Tables.documents(spark, sf0001)
    val batch = TextChunk.chunk(docs)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    val perRow = StreamingChunkDedup.chunkRows(docs)
    assert(batch.exceptAll(perRow).isEmpty && perRow.exceptAll(batch).isEmpty)
  }

  test("streamed canonical assignment is chunking-invariant and matches " +
      "the batch rn = 1 rule") {
    val docs = Tables.documents(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_id"))
    val batch = TextChunk.chunk(docs)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("chunk_hash"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("chunk_hash"), col("doc_id"), col("chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingChunkDedup.canonicalFromFiles(spark, sf0001, chunks)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      assert(streamed.sameElements(batch), s"chunks=$chunks diverged")
    }
  }
}
