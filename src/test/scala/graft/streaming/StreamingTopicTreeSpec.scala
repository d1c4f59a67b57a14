package graft.streaming

import graft.SparkSpec
import graft.operators.MqttQueries

/** Chunking-invariance pin for the topic-tree streaming twin: the rollup
  * streamed in 1 and 3 micro-batches equals the batch operator row for
  * row (the monotone max-fold makes emission order irrelevant).
  */
class StreamingTopicTreeSpec extends SparkSpec {

  test("streamed rollup is chunking-invariant and equals the batch tree") {
    val batch = MqttQueries.topicTree(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingTopicTree.treeFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks diverged from batch")
    }
  }
}
