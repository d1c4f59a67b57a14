package graft.operators

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.Hash60

/** Seeded-random model check for weighted hash-replication sampling: an
  * INDEPENDENT driver-side min-of-w-hashes reimplementation against
  * random (doc_id, n_chars) frames — winners, weights, and priorities
  * must match row-for-row, including the (priority, doc_id) tie order.
  */
class WeightedSamplePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def model(rows: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long)] =
    rows.map { case (id, nChars) =>
      val w = 1L + math.min(nChars / WeightedSample.WeightDivisor,
        WeightedSample.MaxExtraWeight)
      val priority = (1L to w).map { i =>
        Hash60.hash(UTF8String.fromString(
          s"${WeightedSample.WeightedSalt}$id:$i"))
      }.min
      (id, w, priority)
    }.sortBy { case (id, _, p) => (p, id) }.take(k)

  test("random corpora agree with the model (12 seeded cases)") {
    (1 to 12).foreach { seed =>
      val rnd = new Random(seed)
      val rows = (0 until 30 + rnd.nextInt(300)).map { _ =>
        rnd.nextLong(1000000L) -> rnd.nextLong(1200L)
      }.distinctBy(_._1)
      val k = 1 + rnd.nextInt(40)
      val got = WeightedSample.sample(rows.toDF("doc_id", "n_chars"), k)
        .select($"doc_id", $"weight", $"priority").as[(Long, Long, Long)]
        .collect().toSeq
      assert(got == model(rows, k), s"seed=$seed k=$k")
    }
  }
}
