package graft.streaming

import graft.SparkSpec
import graft.operators.LengthHistogram

/** The streamed band histogram must equal the batch histogram at any
  * micro-batch chunking: both per-(source, band) counters are monotone
  * nondecreasing, so the max-fold over update-mode emissions
  * reconstructs the final table regardless of how the corpus was cut.
  */
class StreamingLengthHistogramSpec extends SparkSpec {

  test("streamed length histogram equals batch at every chunking") {
    val batch = LengthHistogram.histogramDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingLengthHistogram
        .histogramFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
