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

  private def runDelta(old: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame, cap: Long = 512L) =
    SemanticDedup.semanticDedupDelta(old, delta, k = 2, cap = cap)
      .select($"vec_id", $"capped", $"dup_of_old", $"kept")
      .as[(Long, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("delta: existing content wins regardless of id order") {
    // old member 9 holds content u; delta id 5 < 9 re-crawls the same
    // content — the delta copy is dropped (dup_of_old), NOT the old one:
    // the frozen keep-list is immutable, unlike the intra-batch min-id rule
    val u = Array(1f, 0f, 0.5f, 0f)
    val got = runDelta(frame(0L -> c0, 1L -> c1, 9L -> u), frame(5L -> u))
    assert(got(5L) == ((false, true, false)), got)
  }

  test("delta: dropped old members do not dominate — only the kept corpus does") {
    // y5 ~ y9 (cos 0.961 >= 0.95): old dedup keeps 5, drops 9. Delta z is
    // within threshold of the DROPPED 9 only (cos 0.961) and below it to
    // the kept 5 (cos 0.848) -> z survives: it does not duplicate anything
    // that actually enters training
    def ray(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat, 0f,
      math.sin(math.toRadians(deg)).toFloat, 0f)
    val got = runDelta(
      frame(0L -> c0, 1L -> c1, 5L -> ray(0), 9L -> ray(16)),
      frame(40L -> ray(32)))
    assert(got(40L) == ((false, false, true)), got)
  }

  test("delta: intra-batch greedy min-id among the arrivals themselves") {
    // cos(x, c0) = 1/sqrt(1.25) = 0.894 < 0.95: leans cluster 0 without
    // near-dupping its kept member (the centroid vector itself)
    val x = Array(1f, 0f, 0.5f, 0f)
    val got = runDelta(frame(0L -> c0, 1L -> c1),
      frame(20L -> x, 30L -> x))
    assert(got(20L) == ((false, false, true)), got)
    assert(got(30L) == ((false, false, false)), got) // dominated by 20
  }

  test("delta: the probe-time census caps on old-kept + arriving members") {
    // x stays below threshold to c0 (0.894) so old member 5 survives the
    // old dedup and the census really counts old-KEPT members
    val x = Array(1f, 0f, 0.5f, 0f)
    // cluster 0 census: old kept {0, 5} + delta {20, 30} = 4 > cap=3 ->
    // delta members flagged and kept even though 20/30 are identical
    val got = runDelta(frame(0L -> c0, 1L -> c1, 5L -> x),
      frame(20L -> x, 30L -> x), cap = 3L)
    assert(got(20L) == ((true, false, true)), got)
    assert(got(30L) == ((true, false, true)), got)
  }
}
