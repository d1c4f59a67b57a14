package graft.operators

import graft.SparkSpec

/** Dimension-stats semantics on a hand-built frame (the oracle certifies
  * the corpus run): micro floors (negative values floor toward -inf),
  * integer aggregates, one row per dimension.
  */
class EmbDimStatsSpec extends SparkSpec {
  import spark.implicits._

  test("micro floors and integer aggregates match a direct model") {
    val emb = Seq(
      (1L, Array(0.5f, -0.25f)),
      (2L, Array(1.0f, 0.75f)),
      (3L, Array(-0.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = EmbDimStats.stats(emb).orderBy($"dim")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    def micro(v: Float): Long = math.floor(v.toDouble * 1e6).toLong
    val d0 = Seq(0.5f, 1.0f, -0.3f).map(micro)
    val d1 = Seq(-0.25f, 0.75f, 0.0f).map(micro)
    assert(got(0) == ((0, 3L, d0.sum, d0.map(m => m * m).sum, d0.min, d0.max)))
    assert(got(1) == ((1, 3L, d1.sum, d1.map(m => m * m).sum, d1.min, d1.max)))
    // float -0.3f widens to -0.30000001192...; ·1e6 floors toward -inf
    assert(micro(-0.3f) == -300001L)
  }

  test("the corpus run covers every dimension with full counts") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val out = EmbDimStats.statsEmbeddings(spark, sf0001)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).toSeq == out.indices.toSeq, "dims not contiguous from 0")
    assert(out.forall(_._2 == n), "a dimension is missing vectors")
    assert(out.forall(r => r._5 <= r._6))
  }
}
