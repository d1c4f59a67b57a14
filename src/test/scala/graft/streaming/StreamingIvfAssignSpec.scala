package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

/** The streamed IVF assignment must equal the batch artifact at any
  * chunking, and the stateless per-row argmax respelling must match the
  * batch row_number-window spelling PAIR-FOR-PAIR (same cosine
  * expression, same highest-cosine-then-lowest-cid tie rule).
  */
class StreamingIvfAssignSpec extends SparkSpec {

  test("the per-row argmax respelling equals the batch assignment pair-for-pair") {
    val emb = Tables.embeddings(spark, sf0001)
    val batch = Similarity.ivfAssign(emb).collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    val cbRow = StreamingIvfAssign.codebookRow(
      Similarity.centroidsOf(Similarity.withNormOf(emb), 16))
    val perRow = StreamingIvfAssign
      .assignRows(emb.select("vec_id", "embedding"), cbRow)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(perRow == batch)
  }

  test("streamed assignment equals the batch artifact at every chunking") {
    val batch = Similarity.ivfAssign(Tables.embeddings(spark, sf0001))
      .collect().map(_.toSeq).toSeq
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingIvfAssign.assignFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
