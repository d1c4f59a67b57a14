package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

/** The streamed LSH bucket artifact must equal the batch build at any
  * chunking — bucketing is a pure data-independent per-row map (the plane
  * constants), so the stream runs the batch projection verbatim.
  */
class StreamingLshBucketsSpec extends SparkSpec {

  test("streamed buckets equal the batch index at every chunking") {
    val batch = Similarity.lshBucketIndex(Tables.embeddings(spark, sf0001))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingLshBuckets.bucketsFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
