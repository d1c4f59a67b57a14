package graft.operators

import org.apache.spark.sql.DataFrame

import graft.{SlowTest, SparkSpec}
import graft.sources.Tables

/** Pins the fusion-quality contract of [[Bm25.hybridRecallCurve]] — the
  * measured curve behind the shipped FusionDepth/RrfK knobs (the r18
  * `ann_rerank_batch` lesson: unmeasured knobs hide recall cliffs):
  *  - USEFULNESS at the tail depth: hybrid consensus recall ≥ each leg's,
  *    on a fixture where the consensus set is non-empty (sf0.001: 5 docs;
  *    measured hybrid 1.000 vs lex 0.800 / vec 0.200 — the doc ranked
  *    ~12th by both systems is exactly what fusion retrieves).
  *  - NON-COLLAPSE at sf0.1 (where the synthetic corpus' consensus set is
  *    honestly empty and fusion is a pure interleave): each leg's top-5
  *    retention stays above the floor — a fusion collapsing onto one leg
  *    reads 1.0/0.0 and fails here. Measured 0.400 lex / 0.600 vec.
  *  - TAIL ≡ SHIPPED: the curve's deepest fusion is the `ann_hybrid_rrf`
  *    serve verbatim (restricting a depth-20 list to rank ≤ 20 is the
  *    identity) — pinned row-for-row so the instrument can never drift
  *    from the operator it prices.
  */
class HybridRecallSpec extends SparkSpec {
  import spark.implicits._

  private def curve(dir: String): Map[Long, Map[String, Long]] =
    Bm25.hybridRecallCurve(Tables.documents(spark, dir), Tables.embeddings(spark, dir))
      .collect().map { r =>
        r.getLong(r.fieldIndex("depth")) ->
          r.schema.fieldNames.map(f => f -> r.getLong(r.fieldIndex(f))).toMap
      }.toMap

  test("tail depth: hybrid consensus recall beats each leg, non-vacuously") {
    val tail = curve(sf0001)(Bm25.FusionDepth.toLong)
    assert(tail("n_consensus") > 0, "fixture must have a consensus set")
    assert(tail("hyb_cons_recall_ppm") >= tail("lex_cons_recall_ppm"),
      "fusion must not lose consensus docs the lexical leg retains")
    assert(tail("hyb_cons_recall_ppm") >= tail("vec_cons_recall_ppm"),
      "fusion must not lose consensus docs the vector leg retains")
    assert(tail("hyb_cons_recall_ppm") == 1000000L,
      "measured tail consensus recall is 1.0 on this fixture")
  }

  test("the curve's tail fusion IS the shipped ann_hybrid_rrf serve") {
    val docs = Tables.documents(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    def rows(df: DataFrame) = df
      .select($"query_id", $"rank", $"doc_id", $"lex_rank", $"vec_rank", $"rrf_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    import org.apache.spark.sql.functions.col
    val lexDeep = Bm25.bm25TopK(docs, Bm25.FusionDepth)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vecDeep = Similarity.bruteForceTopK(emb, Bm25.QueryCount, Bm25.FusionDepth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    assert(rows(Bm25.rrfFuse(lexDeep, vecDeep, Bm25.TopK)) ===
      rows(Bm25.hybridRrf(docs, emb)))
  }

  test("sf0.1: leg retention floors hold (fusion never collapses onto one leg)", SlowTest) {
    val tail = curve("/root/testdata/sf0.1")(Bm25.FusionDepth.toLong)
    val lex = tail("hyb_lex_recall_ppm")
    val vec = tail("hyb_vec_recall_ppm")
    info(s"sf0.1 tail: lex retention ${lex / 1e6}, vec retention ${vec / 1e6}, " +
      s"n_consensus ${tail("n_consensus")}")
    assert(lex >= 300000L, s"lexical head retention below floor: $lex ppm")
    assert(vec >= 300000L, s"vector head retention below floor: $vec ppm")
  }
}
