package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** PQ/ADC invariants: encoding picks the true per-subspace argmin (checked
  * against a driver-side model), codebook members encode to themselves, the
  * ADC total is the sum of the per-subspace LUT entries, and the plan stays
  * broadcast-hash only (codes shuffle, never embeddings x codebook pairs).
  */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._
  import ProductQuantization._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(Similarity.Dim)(d => (Similarity.planeWeight(seed, d) * 2).toFloat)

  private def emb(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  /** Driver-side model of the micro-scaled subspace distance. */
  private def dMicro(a: Array[Float], b: Array[Float], m: Int): Long = {
    var acc = 0.0
    var i = 0
    while (i < SubDim) {
      val d = a(m * SubDim + i).toDouble - b(m * SubDim + i).toDouble
      acc += d * d
      i += 1
    }
    math.floor(acc * 1e6).toLong
  }

  test("encode picks the per-subspace argmin of the driver-side model") {
    val n = 40
    val vectors = (0 until n).map(vec)
    val codes = encode(emb(n), subCodebook(emb(n)))
      .as[(Long, Int, Int)].collect()
      .map { case (v, m, c) => (v, m) -> c }.toMap
    assert(codes.size == n * NumSub)
    for (v <- 0 until n; m <- 0 until NumSub) {
      val expected = (0 until NumCodes)
        .map(c => (dMicro(vectors(v), vectors(c), m), c)).min._2
      assert(codes((v.toLong, m)) == expected, s"vec $v subspace $m")
    }
  }

  test("codebook vectors encode to themselves (distance zero is the argmin)") {
    val codes = encode(emb(NumCodes), subCodebook(emb(NumCodes)))
      .as[(Long, Int, Int)].collect()
    // distinct pseudo-random subvectors: each codeword's nearest codeword is
    // itself at distance exactly 0
    assert(codes.forall { case (v, _, c) => c == v.toInt })
  }

  test("ADC distance is the sum of the per-subspace LUT entries, ranked ascending") {
    val n = 40
    val vectors = (0 until n).map(vec)
    val out = adcTopK(emb(n), queryMaxId = 2, k = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 1), (0L, 2), (0L, 3), (1L, 1), (1L, 2), (1L, 3)))
    // driver-side model: encode every vector, then ADC against each query
    def codeOf(v: Int, m: Int): Int =
      (0 until NumCodes).map(c => (dMicro(vectors(v), vectors(c), m), c)).min._2
    def adc(q: Int, v: Int): Long =
      (0 until NumSub).map(m => dMicro(vectors(q), vectors(codeOf(v, m)), m)).sum
    for (q <- 0 to 1) {
      val expected = (0 until n).filter(_ != q)
        .map(v => (adc(q, v), v.toLong)).sorted.take(3)
      val got = out.filter(_._1 == q).sortBy(_._2).map(t => (t._4, t._3)).toSeq
      assert(got == expected, s"query $q")
    }
  }

  test("ivfPq scores exactly the probed candidate set, with the same ADC totals") {
    val n = 40
    val out = ivfPqTopK(emb(n), nProbe = 4, queryMaxId = 2, k = 3)
      .as[(Long, Int, Long, Long)].collect()
    val full = adcTopK(emb(n), queryMaxId = 2, k = n)
      .as[(Long, Int, Long, Long)].collect()
      .map(t => (t._1, t._3) -> t._4).toMap
    // every IVF+PQ row's ADC total equals the full ADC scan's for that pair
    // (the coarse stage prunes candidates, never changes scores), and ranks
    // are strictly increasing per query
    assert(out.nonEmpty)
    assert(out.forall { case (q, _, v, d) => full((q, v)) == d })
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1 to rows.length))
    }
  }

  test("the plan is broadcast-hash only: no nested loop, no cartesian, codes-only shuffle") {
    val df = adcTopK(emb(40))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
