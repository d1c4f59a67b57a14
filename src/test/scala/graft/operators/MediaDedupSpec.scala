package graft.operators

import graft.SparkSpec

/** Semantics pins for [[Multimodal.mediaDedupExact]]: dedup keys on the
  * payload BYTES alone (media_type derived from a different id does not
  * shield a byte-identical copy), keep-min rule, non-duplicates absent.
  * Ids avoid the %250 probe residue so the synthetic corpus controls
  * every group.
  */
class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("byte-identical payloads dedup across media types; keeper is min id") {
    val docs = Seq(
      10L -> "same payload bytes",
      11L -> "same payload bytes",  // type differs (11 % 3 != 10 % 3)
      12L -> "same payload bytes",
      20L -> "unique bytes one",
      21L -> "unique bytes two").toDF("doc_id", "text")
    val got = Multimodal.mediaDedupExact(docs)
      .as[(Long, Long, Long)].collect().toSeq
    val payloadLen = "same payload bytes".length.toLong
    assert(got == Seq((11L, 10L, payloadLen), (12L, 10L, payloadLen)))
  }

  test("the probe family makes duplicate groups exist on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Multimodal.mediaDedupExact(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // every probe copy (+4e6, %250==3) resolves to its original keeper
    val probes = got.filter(_._1 >= DedupAttribution.ExactProbeOffset)
    assert(probes.nonEmpty)
    probes.foreach { case (id, keeper, _) =>
      assert(keeper == id - DedupAttribution.ExactProbeOffset)
    }
  }
}
