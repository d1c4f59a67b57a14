package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Semantics pins for [[Similarity.ivfProbeCurve]]: the curve is the
  * certified IVF operators' knob, provably — its p=4 and p=6 points
  * equal the measured recall of `ann_ivf` and `ann_ivf_rerank`, the
  * full-scan point is 1.0 by construction, and the curve is monotone.
  */
class IvfProbeCurveSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("curve points equal the certified operators' measured recall") {
    val emb = Tables.embeddings(spark, sf0001)
    val rows = Similarity.ivfProbeCurve(emb)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows.map(_._1) == Similarity.ProbeCurvePoints)
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 >= a._2, s"recall fell with probes: $a -> $b")
      case _ => ()
    }
    // probing every cell scans the whole corpus: recall is exactly 1
    assert(rows.last._2 == rows.last._3 && rows.last._4 == 1000000L)
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val hits4 = (pairs(Similarity.ivfTopK(emb)) & exact).size.toLong
    val hits6 = (pairs(Similarity.ivfRerankTopK(emb)) & exact).size.toLong
    assert(rows.find(_._1 == 4).get._2 == hits4,
      "p=4 curve point != ann_ivf's measured hits")
    assert(rows.find(_._1 == Similarity.IvfRerankProbe).get._2 == hits6,
      "p=6 curve point != ann_ivf_rerank's measured hits")
  }
}
