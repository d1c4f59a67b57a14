package graft.operators

import graft.SparkSpec

/** Chunk-grid semantics: window/stride coverage, the subset-tail
  * suppression rule, in-order reassembly, and the W/S replication bound.
  */
class TextChunkSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  private def chunksOf(n: Int): Seq[(Long, Long, String)] =
    TextChunk.chunk(Seq((1L, doc(n))).toDF("doc_id", "text"))
      .orderBy("chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
      .map(r => (r._2, r._3, r._4))

  test("a doc shorter than one window is a single chunk") {
    assert(chunksOf(3) == Seq((0L, 3L, "t0 t1 t2")))
  }

  test("a tail chunk that is a subset of its predecessor is suppressed") {
    // 25 tokens: chunk 1 would cover only pos 24 (inside chunk 0's 0..31)
    val got = chunksOf(25)
    assert(got.map(_._1) == Seq(0L))
    assert(got.head._2 == 25L)
  }

  test("tail chunks extending past the overlap are kept, in order") {
    // 40 tokens: chunk 0 = pos 0..31 (32), chunk 1 = pos 24..39 (16)
    val got = chunksOf(40)
    assert(got.map(t => (t._1, t._2)) == Seq((0L, 32L), (1L, 16L)))
    assert(got(1)._3.startsWith("t24 t25 ") && got(1)._3.endsWith(" t39"))
  }

  test("the boundary case: one token past the overlap keeps the tail") {
    // 33 tokens: chunk 1 = pos 24..32, max pos 32 >= 24 + 8 -> kept
    assert(chunksOf(33).map(t => (t._1, t._2)) == Seq((0L, 32L), (1L, 9L)))
  }

  test("coverage is exact: every token appears in >= 1 chunk, <= 2 chunks") {
    val total = chunksOf(100).map(_._2).sum
    // 100 tokens, stride 24 -> chunks at 0,24,48,72 cover 32+32+32+28;
    // the pos-96 start is suppressed (96..99 all inside chunk 3's window)
    assert(total == 32L + 32L + 32L + 28L)
  }

  test("the corpus run is non-vacuous with bounded chunk sizes") {
    val out = TextChunk.chunkDocuments(spark, sf0001)
      .as[(Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._3 <= TextChunk.ChunkWindow))
    assert(out.exists(_._2 > 0L), "no document ever produced a second chunk")
  }
}
