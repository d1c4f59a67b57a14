package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantics pins for [[ProductQuantization.pqCodesDelta]]: the delta is
  * exactly the added-id set of the snapshot carve, and the codes agree
  * with an INDEPENDENT spelling of the same frozen-codebook argmin (the
  * streaming twin's per-row array form) — cross-spelling agreement, not
  * self-comparison.
  */
class PqCodesDeltaSpec extends SparkSpec {

  test("delta ids are the anti-join set and codes match the per-row spelling") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = ProductQuantization.pqCodesDelta(spark, sf0001)
    val rows = got.collect().map(_.toSeq).toSeq
    assert(rows.nonEmpty)
    // exactly the added ids (vec_id % AddedMod == 0), all M codes each
    val deltaIds = got.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val expectedIds = emb.filter(col("vec_id") % CorpusDiff.AddedMod === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deltaIds == expectedIds)
    assert(rows.size == deltaIds.size * ProductQuantization.NumSub)
    // frozen-codebook agreement via the independent per-row argmin
    val old = emb.filter(col("vec_id") % CorpusDiff.AddedMod =!= 0)
    val frozen = ProductQuantization.subCodebook(old)
    val delta = emb.filter(col("vec_id") % CorpusDiff.AddedMod === 0)
    val perRow = graft.streaming.StreamingPqCodes
      .encodeRows(delta.select("vec_id", "embedding"),
        graft.streaming.StreamingPqCodes.codebookRows(frozen))
      .orderBy("vec_id", "m").collect().map(_.toSeq).toSeq
    assert(perRow == rows)
  }
}
