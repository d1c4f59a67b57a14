package graft.operators

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: (Long, Long)*) =
    DedupClusters.components(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Boolean)].collect().toSet

  test("transitive pairs collapse to one cluster with the min-id survivor") {
    // A~B, B~C (A~C never emitted) plus an independent D~E
    val got = components((1L, 2L), (2L, 3L), (10L, 11L))
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("a long chain converges (diameter many rounds) with correct labels") {
    // path 0-1-2-...-9: worst-case diameter for propagation
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = components(chain: _*)
    assert(got == (0L to 9L).map(i => (i, 0L, i == 0L)).toSet)
  }

  test("distributed propagation equals driver union-find on a seeded random graph") {
    // the two paths are INDEPENDENT implementations (min-label propagation
    // with pointer jumping vs union-find), so agreement on a messy graph —
    // chains, cycles, stars, singleton-free random edges — is real evidence
    // for both; the small fixtures above all route to the fast path now
    val rnd = new scala.util.Random(42)
    val edges = (1 to 300).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val dist = DedupClusters.components(edges.toDF("doc_a", "doc_b"), driverMaxPairs = 0L)
      .as[(Long, Long, Boolean)].collect().toSet
    val fast = DedupClusters.components(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(dist == fast)
    assert(dist.nonEmpty && dist.exists(!_._3)) // non-trivial clusters exist
  }

  test("the distributed path (forced past the driver fast path) labels identically") {
    val chain = (0L until 9L).map(i => (i, i + 1)) :+ (20L, 21L)
    val got = DedupClusters.components(
      chain.toDF("doc_a", "doc_b"), driverMaxPairs = 0L)
      .as[(Long, Long, Boolean)].collect().toSet
    val fast = DedupClusters.components(chain.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == fast)
    assert(got == ((0L to 9L).map(i => (i, 0L, i == 0L)) ++
      Seq((20L, 20L, true), (21L, 20L, false))).toSet)
  }

  test("propagation shuffle width derives from the edge count, clamped to the session") {
    import DedupClusters.{propagationPartitions => p, TargetEdgesPerPartition => T}
    assert(p(100L, 2000, None) == 8) // tiny graph: floor of 8, not near-empty reducers
    assert(p(T * 2, 2000, None) == 8) // still under the floor
    assert(p(T * 100, 2000, None) == 100) // big graph: sized by edges
    assert(p(T * 100000, 2000, None) == 2000) // ceiling: the session's cluster sizing
    assert(p(100L, 4, None) == 4) // a narrow session keeps its ceiling, floor or not
    assert(p(T * 100, 2000, Some(64)) == 64) // explicit parameter wins
  }

  test("an explicit shuffle-partition override still yields correct labels") {
    val got = DedupClusters.components(
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"), shufflePartitions = Some(2))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("no cached blocks accumulate across repeated calls (both paths release eagerly)") {
    def persistedCount = spark.sparkContext.getPersistentRDDs.size
    val before = persistedCount
    // driver path: pair cache must be released before returning
    (1 to 3).foreach { _ => components((1L, 2L), (2L, 3L)) }
    // <= because the async ContextCleaner may also reclaim older RDDs
    assert(persistedCount <= before,
      s"driver path leaked caches: $before -> $persistedCount")
    // distributed path: pair + edge caches released; only the final labels
    // cache (backing the returned, here fully-consumed, frame) may remain
    // per call until GC — bounded by 1, not by the loop's round count
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    (1 to 3).foreach { _ =>
      DedupClusters.components(edges.toDF("doc_a", "doc_b"), driverMaxPairs = 0L)
        .collect()
    }
    val after = persistedCount
    assert(after - before <= 3, // at most the per-call labels cache, never p/edges
      s"distributed path leaked caches: $before -> $after")
  }

  test("exactly one survivor per cluster") {
    val got = components((5L, 3L), (3L, 8L), (8L, 5L), (20L, 21L))
    val byCluster = got.groupBy(_._2)
    assert(byCluster.keySet == Set(3L, 20L))
    byCluster.values.foreach(c => assert(c.count(_._3) == 1))
  }
}
