package graft.streaming

import graft.SparkSpec
import graft.operators.Quantize
import graft.sources.Tables

/** The streamed int8 quantization must equal the batch pass at any
  * chunking — per-vector scaling is row-local, so the stream runs the
  * batch spelling verbatim.
  */
class StreamingQuantizeSpec extends SparkSpec {

  test("streamed quantization equals the batch pass at every chunking") {
    val batch = Quantize.int8(Tables.embeddings(spark, sf0001))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    Seq(1, 3).foreach { chunks =>
      val streamed = StreamingQuantize.int8FromFiles(spark, sf0001, chunks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
