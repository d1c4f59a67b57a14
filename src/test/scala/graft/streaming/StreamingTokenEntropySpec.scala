package graft.streaming

import graft.SparkSpec
import graft.operators.TokenEntropy

/** Chunking-invariance pin for the entropy streaming twin: the profile
  * streamed in 1 and 3 micro-batches equals the batch operator row for
  * row (the monotone max-fold makes emission order irrelevant).
  */
class StreamingTokenEntropySpec extends SparkSpec {

  test("streamed profile is chunking-invariant and equals the batch form") {
    val batch = TokenEntropy.profileDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingTokenEntropy.profileFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks diverged from batch")
    }
  }
}
