package graft.operators

import graft.SparkSpec

/** Deterministic training shuffle: bijective positions, stable permutation,
  * shard consistency.
  */
class GlobalShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("positions are exactly 1..N — a bijection, no gaps or dupes") {
    val pos = GlobalShuffle.shuffled(docs(500)).select($"pos").as[Long]
      .collect().sorted
    assert(pos.toSeq == (1L to 500L))
  }

  test("the permutation is deterministic and partitioning-invariant") {
    val base = docs(300)
    val a = GlobalShuffle.shuffled(base.repartition(1))
      .select($"doc_id", $"pos").as[(Long, Long)].collect().sortBy(_._1)
    val b = GlobalShuffle.shuffled(base.repartition(13))
      .select($"doc_id", $"pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("the order actually scrambles: not the identity and not a constant offset") {
    val byPos = GlobalShuffle.shuffled(docs(200)).select($"pos", $"doc_id")
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val fixedPoints = byPos.zipWithIndex.count { case (d, i) => d == i.toLong }
    assert(fixedPoints < 20, s"$fixedPoints fixed points in 200 — not shuffled")
    // adjacent doc_ids should rarely stay adjacent under a hash order
    val adjacentKept = byPos.sliding(2).count { case Array(a, b) => b == a + 1; case _ => false }
    assert(adjacentKept < 20, s"$adjacentKept adjacent pairs preserved")
  }

  test("shards cover [0, NumShards) and are consistent with the hash") {
    val shards = GlobalShuffle.shuffled(docs(400)).select($"shard").as[Long]
      .collect()
    assert(shards.forall(s => s >= 0L && s < GlobalShuffle.NumShards))
    // 400 docs over 16 shards: every shard should be hit
    assert(shards.distinct.length == GlobalShuffle.NumShards)
  }

  test("epoch shuffles: each epoch is a full contiguous permutation, and they differ") {
    val out = GlobalShuffle.epochShuffled(docs(150))
      .select($"epoch", $"doc_id", $"pos").as[(Int, Long, Long)].collect()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2, 3))
    val perms = (1 to 3).map { e =>
      val rows = byEpoch(e)
      assert(rows.map(_._3).sorted.toSeq == (1L to 150L), s"epoch $e positions not 1..N")
      assert(rows.map(_._2).sorted.toSeq == (0L until 150L), s"epoch $e doc set wrong")
      rows.sortBy(_._3).map(_._2).toSeq
    }
    assert(perms(0) != perms(1) && perms(1) != perms(2) && perms(0) != perms(2),
      "epoch permutations are not independent")
  }
}
