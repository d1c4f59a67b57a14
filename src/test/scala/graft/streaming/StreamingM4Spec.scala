package graft.streaming

import graft.SparkSpec
import graft.operators.M4Downsample

/** The streamed M4 reduction must equal the batch reduction exactly at
  * any micro-batch chunking: each per-bucket extreme is monotone under
  * its struct order, so the tuple min/max fold over update-mode
  * emissions reconstructs the final extremes regardless of how the
  * stream was cut — including ties, which the (us, event_id) tuple tail
  * resolves identically in both forms.
  */
class StreamingM4Spec extends SparkSpec {

  test("streamed M4 equals the batch reduction at every chunking") {
    val batch = M4Downsample.downsampleEvents(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingM4.downsampleFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
