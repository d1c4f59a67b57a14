package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Symmetric int8 quantization: range, reconstruction bound, degenerate
  * vectors, and the single-evaluation plan shape.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  /** Driver-side mirror of the quantizer for property checks. */
  private def model(v: Seq[Float]): (Double, Seq[Long]) = {
    val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
    val q = if (scale == 0.0) v.map(_ => 0L)
      else v.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
    (scale, q)
  }

  test("codes stay in [-127, 127] and reconstruction error is within scale/2") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4f)))
    val got = Quantize.int8(emb(vecs: _*))
      .select($"vec_id", $"scale", $"q_hash").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    vecs.foreach { case (id, v) =>
      val (scale, q) = model(v)
      assert(q.forall(c => c >= -127 && c <= 127))
      // reconstruction: |q*scale - v| <= scale/2 (round-to-nearest)
      q.zip(v).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12)
      }
      assert(got(id)._1 == scale)
      // hash matches the model's serialization exactly
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(q.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(id)._2 == digest)
    }
  }

  test("the zero vector quantizes to zeros instead of NaN") {
    val got = Quantize.int8(emb((1L, Seq(0f, 0f, 0f))))
      .select($"scale", $"q_hash").as[(Double, String)].head()
    assert(got._1 == 0.0)
    val zeros = java.security.MessageDigest.getInstance("MD5")
      .digest("0,0,0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got._2 == zeros)
  }

  test("max|v| is computed once per row, not once per element") {
    // scale is referenced inside the per-element lambda; if projection
    // collapse inlined it, the array_max pass would run d times per row
    val plan = Quantize.int8(
      spark.range(4).select(col("id").as("vec_id"),
        array(lit(1f), lit(2f)).as("embedding")))
      .queryExecution.executedPlan.toString
    val n = "array_max".r.findAllIn(plan).size
    assert(n == 1, s"expected one array_max evaluation, got $n:\n$plan")
  }
}
