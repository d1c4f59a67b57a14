package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupDelta
import graft.sources.Tables

/** The ingest-time winnow delta screen must emit exactly the batch
  * screen's (pair, shared-count) rows at any chunking: each document's
  * fingerprint array rides ONE staged row (a doc's passages never split
  * across micro-batches), so every pair's count completes inside its own
  * batch and the monotone readback fold is batch-order-independent — and
  * the frozen fingerprint posting index is the SAME artifact both forms
  * build.
  */
class StreamingWinnowDeltaSpec extends SparkSpec {

  test("streamed winnow delta counts equal the batch screen at every chunking") {
    val docs = Tables.documents(spark, sf0001)
    val batch = DedupDelta.winnowProbePairs(
        DedupDelta.oldAugmented(docs), DedupDelta.deltaDocs(docs))
      .orderBy(col("doc_id"), col("old_id"))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingWinnowDelta
        .winnowDeltaFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
