package graft.streaming

import graft.SparkSpec
import graft.operators.VocabGrowth
import graft.sources.Tables

/** The streamed vocabulary growth curve must equal the batch curve at
  * any chunking: per-token min(doc_id) is monotone nonincreasing, so the
  * min-fold over update-mode emissions reconstructs the final first-seen
  * table regardless of how the corpus was cut — and the curve is a pure
  * function of (corpus, first-seen).
  */
class StreamingVocabGrowthSpec extends SparkSpec {

  test("streamed growth equals the batch curve at every chunking") {
    val batch = VocabGrowth.growth(Tables.documents(spark, sf0001))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingVocabGrowth.growthFromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
