package graft.operators

import graft.SparkSpec

/** Semantics pins for [[ProductQuantization.rerankDepthCurve]]: the
  * curve is monotone in depth, its deepest point reproduces the serve
  * form's measured recall (an exact re-rank over ADC top-C recovers
  * exactly exact-top-k ∩ ADC-top-C), and the hit counts are bounded by
  * n_exact.
  */
class RerankDepthCurveSpec extends SparkSpec {

  test("curve is monotone and the deepest point equals the serve form's recall") {
    val rows = ProductQuantization.rerankDepthCurve(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows.map(_._1) == ProductQuantization.DepthCurvePoints)
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 >= a._2, s"recall fell with depth: $a -> $b")
      case _ => ()
    }
    rows.foreach { case (_, hits, nExact, ppm) =>
      assert(hits <= nExact)
      assert(ppm == hits * 1000000L / nExact)
    }
    // deepest depth == the serve operator's configuration: the curve's
    // last point must equal the recall the certified rerank form attains
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val served = ProductQuantization.ivfPqResRerankTopK(emb)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col("vec_id"))
    val exact5 = emb.as("c")
      .join(broadcast(queries), col("query_id") =!= col("c.vec_id"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"),
        floor(graft.functions.VectorFunctions.sqDist(col("qv"),
          col("c.embedding")) * 1e6).cast("long").as("d"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val servedHits = (served & exact5).size.toLong
    assert(rows.last._2 == servedHits,
      s"curve tail ${rows.last._2} != serve-form hits $servedHits")
  }
}
