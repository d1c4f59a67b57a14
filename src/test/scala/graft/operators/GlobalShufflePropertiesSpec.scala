package graft.operators

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.Hash60

/** Seeded-random model check for the training shuffle: an INDEPENDENT
  * driver-side reimplementation (Hash60 directly, sort, index) against
  * sparse, clustered, and large-valued doc_id sets — the permutation,
  * positions, and shards must match row-for-row.
  */
class GlobalShufflePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def model(ids: Seq[Long]): Seq[(Long, Long, Long)] =
    ids.map { id =>
      val hv = Hash60.hash(UTF8String.fromString(GlobalShuffle.ShuffleSalt + id))
      (id, hv % GlobalShuffle.NumShards, hv)
    }.sortBy { case (id, _, hv) => (hv, id) }
      .zipWithIndex
      .map { case ((id, shard, _), i) => (id, shard, i + 1L) }

  test("random sparse id sets agree with the model (15 seeded cases)") {
    (1 to 15).foreach { seed =>
      val rnd = new Random(seed)
      val ids = (0 until 20 + rnd.nextInt(200)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => rnd.nextLong(1000)            // dense small ids
          case 1 => 1000000L + rnd.nextLong(50)   // clustered block
          case 2 => rnd.nextLong(Long.MaxValue)   // huge ids
          case _ => rnd.nextLong(100)             // collisions with case 0
        }
      }.distinct
      val got = GlobalShuffle.shuffled(ids.toDF("doc_id"))
        .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)]
        .collect().sortBy(_._3)
      val want = model(ids).sortBy(_._3)
      assert(got.toSeq == want, s"seed=$seed")
    }
  }
}
