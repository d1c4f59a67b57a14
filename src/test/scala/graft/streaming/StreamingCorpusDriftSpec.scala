package graft.streaming

import graft.SparkSpec
import graft.operators.CorpusDrift

/** The streamed drift must equal the batch drift exactly at any
  * micro-batch chunking (counter increments commute; the fold is a max
  * over monotone cumulative counts).
  */
class StreamingCorpusDriftSpec extends SparkSpec {

  test("streamed new-snapshot drift equals the batch drift at every chunking") {
    val batch = CorpusDrift.driftDocuments(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingCorpusDrift.driftFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
