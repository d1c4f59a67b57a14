package graft.streaming

import graft.SparkSpec
import graft.operators.ProductQuantization
import graft.sources.Tables

/** The streamed PQ-code index must equal the batch build at any
  * micro-batch chunking (encoding is a pure per-row map under the frozen
  * codebook), and the stateless per-row argmin respelling must match the
  * batch `min_by` aggregation PAIR-FOR-PAIR — the one-spelling discipline
  * for a streaming twin that cannot host the batch form's keyed
  * aggregation.
  */
class StreamingPqCodesSpec extends SparkSpec {

  test("the per-row encode respelling equals the batch encode pair-for-pair") {
    val emb = Tables.embeddings(spark, sf0001)
    val cb = ProductQuantization.subCodebook(emb)
    val batch = ProductQuantization.encode(emb, cb)
      .orderBy("vec_id", "m").collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    val perRow = StreamingPqCodes
      .encodeRows(emb.select("vec_id", "embedding"),
        StreamingPqCodes.codebookRows(cb))
      .orderBy("vec_id", "m").collect().map(_.toSeq).toSeq
    assert(perRow == batch)
  }

  test("streamed codes equal the batch index at every chunking") {
    val batch = ProductQuantization.pqCodes(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingPqCodes.codesFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
