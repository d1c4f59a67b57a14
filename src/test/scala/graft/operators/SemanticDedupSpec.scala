package graft.operators

import graft.SparkSpec

/** SemDeDup semantics: within-cluster keep-lowest-id, cluster scoping,
  * greedy-chain behavior, and the observed cap.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** vec_ids 0 and 1 are the codebook (k = 2). */
  private def frame(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  private val c0 = Array(1f, 0f, 0f, 0f)
  private val c1 = Array(0f, 1f, 0f, 0f)

  private def run(df: org.apache.spark.sql.DataFrame, cap: Long = 512L) =
    SemanticDedup.semanticDedup(df, k = 2, cap = cap)
      .select($"vec_id", $"cid", $"capped", $"kept")
      .as[(Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("an exact duplicate in the same cluster keeps the lower id only") {
    val got = run(frame(0L -> c0, 1L -> c1, 5L -> c0, 9L -> c0))
    assert(got(0L)._3 && got(5L)._3 == false && got(9L)._3 == false, got)
    assert(got(1L)._3, got)
  }

  test("a near-dup pair straddling two clusters is NOT compared: both kept") {
    // u leans c0, v leans c1, but cos(u, v) = 1.8/1.81 ~ 0.9945 >= 0.95
    val u = Array(1f, 0.9f, 0f, 0f)
    val v = Array(0.9f, 1f, 0f, 0f)
    val got = run(frame(0L -> c0, 1L -> c1, 7L -> u, 8L -> v))
    assert(got(7L)._1 != got(8L)._1, s"landed in one cluster: $got")
    assert(got(7L)._3 && got(8L)._3, got)
  }

  test("greedy chain: dominated-by-any-smaller, even a dropped middleman") {
    // ids 4 < 6 < 8, all pairwise >= 0.95 to their neighbor only:
    // a(4)~b(6), b(6)~c(8), a-c below threshold. The chain sits orthogonal
    // to BOTH codebook seeds (which are corpus members and could otherwise
    // dominate it): cos to each centroid is 0, tie-broken to cluster 0.
    val a = Array(0f, 0f, 1f, 0.28f)
    val b = Array(0f, 0f, 1f, 0f)
    val c = Array(0f, 0f, 1f, -0.28f)
    val cosAB = 1.0 / math.sqrt(1.0 + 0.28 * 0.28)
    val cosAC = (1.0 - 0.28 * 0.28) / (1.0 + 0.28 * 0.28)
    assert(cosAB >= 0.95 && cosAC < 0.95, s"fixture broken: $cosAB $cosAC")
    val got = run(frame(0L -> c0, 1L -> c1, 4L -> a, 6L -> b, 8L -> c))
    assert(got(4L)._3, got)            // the minimum survives
    assert(!got(6L)._3, got)           // dominated by 4
    assert(!got(8L)._3, got)           // dominated by 6, though 6 dropped
  }

  test("capped clusters skip the quadratic: members kept and flagged") {
    val got = run(frame(0L -> c0, 1L -> c1, 5L -> c0, 9L -> c0), cap = 1L)
    // cluster 0 has 3 members > cap=1: all kept, all flagged
    assert(Seq(0L, 5L, 9L).forall(id => got(id)._2 && got(id)._3), got)
    // cluster 1 has 1 member <= cap: untouched
    assert(!got(1L)._2 && got(1L)._3, got)
  }

  test("trained codebook: the keep rule is unchanged under Lloyd-moved clusters") {
    val got = SemanticDedup.semanticDedup(
      frame(0L -> c0, 1L -> c1, 5L -> c0, 9L -> c0), k = 2, trained = true)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(got(0L) && !got(5L) && !got(9L) && got(1L), got)
  }

  test("partitioning invariance: same decisions under any input split") {
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) c0 else c1
      i -> base.zipWithIndex.map { case (x, d) =>
        x + (if (d == 2) i * 0.001f else 0f) }
    }
    val df1 = frame(rows: _*).repartition(1)
    val df2 = frame(rows: _*).repartition(11)
    assert(run(df1).toSeq.sortBy(_._1) == run(df2).toSeq.sortBy(_._1))
  }
}
