package graft.streaming

import graft.SparkSpec
import graft.operators.Oversample

/** The streamed oversampling manifest must equal the batch manifest at
  * any micro-batch chunking: per-source token sums are monotone
  * nondecreasing, so the max-fold over update-mode emissions
  * reconstructs the final sums regardless of how the corpus was cut —
  * and the manifest is a pure function of (corpus, sums).
  */
class StreamingOversampleSpec extends SparkSpec {

  test("streamed oversample equals the batch manifest at every chunking") {
    val batch = Oversample.manifestDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingOversample.manifestFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
