package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Caching, Dedup, DedupDelta}
import graft.sources.Tables

/** The ingest-time delta screen must emit exactly the batch screen's
  * verdicts at any chunking: the probe chain is stateless (band explode +
  * stream-static joins), so micro-batch boundaries cannot change the pair
  * set — and the frozen index is the SAME artifact both forms read.
  */
class StreamingDedupDeltaSpec extends SparkSpec {

  test("streamed delta verdicts equal the batch screen at every chunking") {
    val docs = Tables.documents(spark, sf0001)
    val oldSets = Caching.cached(
      Dedup.hashedShingleSets(DedupDelta.oldAugmented(docs)))
    val deltaSets = Caching.cached(
      Dedup.hashedShingleSets(DedupDelta.deltaDocs(docs)))
    val batch = DedupDelta.probePairs(oldSets, deltaSets)
      .orderBy(col("doc_id"), col("old_id"))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingDedupDelta
        .minhashDeltaFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
    oldSets.unpersist(); deltaSets.unpersist()
  }
}
