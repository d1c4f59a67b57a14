package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Audio window/hop chunking: boundary model agreement and coverage. */
class AudioChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunk boundaries agree with the sequential window/hop model") {
    val got = Multimodal.audioChunks(Tables.documents(spark, sf0001))
      .select($"doc_id", $"chunk_idx", $"start_sample", $"end_sample", $"start_ms")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(got.nonEmpty)
    val samples = Multimodal.asMedia(Tables.documents(spark, sf0001))
      .filter($"media_type" === "audio/wav")
      .select($"doc_id", ($"meta.byte_len" * 4).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == samples.keySet.filter(samples(_) >= 0))
    got.foreach { case (id, chunks) =>
      val n = samples(id)
      val expected = (0L to (math.max(n - 16000, 0) + 7999) / 8000)
        .map(i => (id, i, i * 8000, math.min(i * 8000 + 16000, n), i * 8000 * 1000 / 16000))
      assert(chunks.sortBy(_._2).toSeq == expected, s"doc $id n=$n")
      // windows tile the stream: last chunk reaches the end, consecutive
      // windows overlap by window-hop
      assert(chunks.map(_._4).max == math.max(n, math.min(16000, n)))
    }
  }

  test("only audio-typed media rows chunk (doc_id % 3 == 1)") {
    val ids = Multimodal.audioChunks(Tables.documents(spark, sf0001))
      .select($"doc_id").distinct().as[Long].collect()
    assert(ids.nonEmpty && ids.forall(_ % 3 == 1))
  }
}
