package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Bm25, CorpusDiff}
import graft.sources.Tables

/** The ingest-time lexical-index maintenance twin must serve exactly the
  * batch refresh (and therefore the rebuild) at any chunking: each
  * (doc, term) increment arrives in exactly one micro-batch, the update-mode
  * fold is monotone, and the merge-and-serve tail is the one shared
  * spelling.
  */
class StreamingBm25DeltaSpec extends SparkSpec {

  test("streamed index maintenance equals the batch refresh at every chunking") {
    val docs = Tables.documents(spark, sf0001)
    val batch = Bm25.bm25DeltaTopK(
      docs.filter(col("doc_id") % CorpusDiff.AddedMod =!= 0),
      docs.filter(col("doc_id") % CorpusDiff.AddedMod === 0))
      .orderBy(col("query_id"), col("rank"))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingBm25Delta.bm25DeltaFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
