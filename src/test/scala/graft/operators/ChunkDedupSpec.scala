package graft.operators

import graft.SparkSpec

/** Chunk-dedup semantics: canonical copy by (doc_id, chunk_id) total
  * order, per-doc survival counts, and composite consistency with the
  * certified chunk operator.
  */
class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("identical chunks keep the lowest (doc_id, chunk_id) copy") {
    // doc 1 and doc 2 are identical 10-token texts -> one chunk each,
    // identical text; doc 1 keeps, doc 2's copy is the duplicate
    val docs = Seq((1L, doc(10, "t")), (2L, doc(10, "t")), (3L, doc(10, "u")))
      .toDF("doc_id", "text")
    val got = ChunkDedup.dedup(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((1L, 1L, 0L)), 2L -> ((1L, 0L, 1L)),
      3L -> ((1L, 1L, 0L))))
  }

  test("counts reconcile: n_kept + n_dup == n_chunks, dedup is non-vacuous") {
    val out = ChunkDedup.dedupDocuments(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._3 + r._4 == r._2))
    assert(out.map(_._4).sum > 0L, "corpus has no duplicate chunks")
    // totals match the chunk operator exactly (composite consistency)
    val chunkTotal = TextChunk.chunkDocuments(spark, sf0001).count()
    assert(out.map(_._2).sum == chunkTotal)
  }
}
