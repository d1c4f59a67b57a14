package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bm25
import graft.sources.Tables

/** The serve-on-ingest twin must emit exactly the batch serve's top-k at
  * any chunking: the probe chain is stateless and the per-(query, doc)
  * score accumulation is a monotone update-mode aggregation, so micro-batch
  * boundaries cannot change the folded scores — and the posting index, the
  * query plans, the contribution spelling and the serve tail are the SAME
  * seams both forms read.
  */
class StreamingBm25Spec extends SparkSpec {

  test("streamed bm25 top-k equals the batch serve at every chunking") {
    val docs = Tables.documents(spark, sf0001)
    val batch = Bm25.bm25TopK(docs)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingBm25.bm25FromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
