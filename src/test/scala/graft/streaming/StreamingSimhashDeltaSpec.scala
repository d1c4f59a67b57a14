package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupDelta
import graft.sources.Tables

/** The ingest-time simhash delta screen must emit exactly the batch
  * screen's verdicts at any chunking: the probe chain is stateless (band
  * explode + one broadcast stream-static join + signature arithmetic), so
  * micro-batch boundaries cannot change the pair set — and the frozen
  * banded-fingerprint index is the SAME artifact both forms build.
  */
class StreamingSimhashDeltaSpec extends SparkSpec {

  test("streamed simhash delta verdicts equal the batch screen at every chunking") {
    val docs = Tables.documents(spark, sf0001)
    val batch = DedupDelta.simhashProbePairs(
        DedupDelta.oldAugmented(docs), DedupDelta.simhashDeltaDocs(docs))
      .orderBy(col("doc_id"), col("old_id"))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingSimhashDelta
        .simhashDeltaFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
