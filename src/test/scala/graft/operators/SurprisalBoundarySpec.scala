package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Boundary-distance audit for the accepted float residual in [[Surprisal]]:
  * `floor(ln(N/tf) * 1e6)` feeds integer sums, so a 1-ulp JVM-vs-DuckDB libm
  * divergence in `ln` would flip the oracle ONLY if some vocabulary term's
  * micro value sits within a few ulps of an integer boundary. This makes that
  * residual risk observable: at both gate scales, every distinct (tf, N)
  * pair's value must sit at least 4 ulps away from the nearest integer.
  *
  * `ln(1) = 0` (tf == N) is the one exactly-on-boundary value; it is exact in
  * every correctly-rounded libm, cannot diverge, and only occurs for a
  * single-term vocabulary — asserted absent at gate scales.
  */
class SurprisalBoundarySpec extends SparkSpec {

  private def audit(dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("token")).filter(length(col("token")) > 0)
    val tfs = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .select(col("tf")).distinct().collect().map(_.getLong(0))
    val totalRow = toks.count()
    assert(tfs.nonEmpty && tfs.exists(_ < totalRow),
      s"degenerate vocabulary at $dir (single-term corpus)")
    val worst = tfs.map { tf =>
      val v = math.log(totalRow.toDouble / tf) * 1e6
      val dist = math.min(v - math.floor(v), math.ceil(v) - v)
      (tf, v, dist, dist / math.ulp(v))
    }.minBy(_._4)
    info(f"${tfs.length} distinct tf values, N=$totalRow; closest boundary: " +
      f"tf=${worst._1} v=${worst._2}%.6f dist=${worst._3}%.3e (${worst._4}%.1f ulps)")
    assert(worst._4 >= 4.0,
      f"ln micro value within 4 ulps of an integer boundary (tf=${worst._1}, " +
        f"${worst._4}%.2f ulps): a cross-libm 1-ulp divergence could flip the oracle")
  }

  test("no vocab ln micro value is within 4 ulps of an integer boundary (sf0.001)") {
    audit(sf0001)
  }

  test("no vocab ln micro value is within 4 ulps of an integer boundary (sf0.01)") {
    audit("/root/testdata/sf0.01")
  }

  /** Same audit for [[BigramSurprisal]]'s conditional ratios: every
    * distinct (c(w1·), c(w1w2)) pair's micro ln value must clear the
    * boundary by the same 4-ulp margin.
    */
  private def auditBigram(dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), lower(col("col")).as("w1"))
      .filter(length(col("w1")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val pc = toks.withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val fc = pc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val ratios = pc.join(fc, Seq("w1")).select(col("c1"), col("c12"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ratios.nonEmpty)
    val worst = ratios.filter(_._1 > 0).map { case (c1, c12) =>
      val v = math.log(c1.toDouble / c12) * 1e6
      val dist = math.min(v - math.floor(v), math.ceil(v) - v)
      // ln(1)=0 (c1==c12: a word with ONE continuation) is exactly on the
      // boundary but exact in every correctly-rounded libm — skip it
      if (c1 == c12) (c1, c12, v, Double.MaxValue)
      else (c1, c12, v, dist / math.ulp(v))
    }.minBy(_._4)
    info(f"${ratios.length} distinct (c1,c12) pairs; closest non-trivial " +
      f"boundary: ${worst._1}/${worst._2} (${worst._4}%.1f ulps)")
    assert(worst._4 >= 4.0,
      f"bigram ln micro value within 4 ulps of a boundary (${worst._1}/${worst._2})")
  }

  test("no bigram conditional ln micro value is within 4 ulps of a boundary (sf0.001)") {
    auditBigram(sf0001)
  }

  test("no bigram conditional ln micro value is within 4 ulps of a boundary (sf0.01)") {
    auditBigram("/root/testdata/sf0.01")
  }
}
