package graft.streaming

import graft.SparkSpec
import graft.operators.Interleave

/** The streamed interleave schedule must equal the batch schedule exactly
  * at any micro-batch chunking: per-source exposure counters are monotone
  * nondecreasing, so the max-fold over update-mode emissions reconstructs
  * the final count table regardless of how the corpus was cut into
  * batches — and the schedule is a pure function of (corpus, counts).
  */
class StreamingInterleaveSpec extends SparkSpec {

  test("streamed interleave equals the batch schedule at every chunking") {
    val batch = Interleave.orderDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingInterleave.orderFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
