package graft.streaming

import graft.SparkSpec
import graft.operators.BudgetSample

/** The streamed budget prefix must equal the batch prefix exactly at any
  * micro-batch chunking: per-bucket token sums are monotone nondecreasing
  * cumulative counters, so the max-fold over update-mode emissions
  * reconstructs the final histogram regardless of how the corpus was cut
  * into batches — the StreamingCorpusDrift discipline on the selection
  * operator.
  */
class StreamingBudgetSampleSpec extends SparkSpec {

  test("streamed budget prefix equals the batch prefix at every chunking") {
    val batch = BudgetSample.sampleDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingBudgetSample.sampleFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
