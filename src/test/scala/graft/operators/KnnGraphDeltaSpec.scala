package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Incremental ≡ rebuild for the kNN-graph delta update, pinned
  * adversarially: a new vector that DISPLACES an old edge, new-node
  * attachment, a new-new pair, and an untouched far cluster — plus exact
  * whole-graph equality on a seeded random corpus (the driver oracle
  * additionally certifies equality on real data at every scale, since
  * `ann_knn_graph_delta`'s oracle IS the rebuild spelling).
  */
class KnnGraphDeltaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors via the shared plane
  // sequence; `base` picks an independent region per cluster
  private def vec(base: Int, jitter: Double = 0.0, jseed: Int = 0): Array[Float] =
    Array.tabulate(Similarity.Dim)(d =>
      (Similarity.planeWeight(base, d) +
        jitter * Similarity.planeWeight(1000 + jseed, d)).toFloat)

  private def emb(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select($"vec_id", $"rank", $"nbr_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("delta update == full rebuild, including edge displacement") {
    // old corpus: cluster {0,1,2} (same base, small jitters) and a far
    // pair {10,11}; delta: 20 = jitter-aligned near-clone of 0 (displaces
    // 0's edges), 30/31 = a new-new identical pair in a third region
    val old = emb(
      0L -> vec(7, 0.05, 1), 1L -> vec(7, 0.05, 2), 2L -> vec(7, 0.05, 3),
      10L -> vec(55, 0.05, 4), 11L -> vec(55, 0.05, 5))
    // 20's jitter is ALIGNED with node 0's (same jseed, slightly scaled),
    // so 0 is unambiguously its nearest neighbor — the in-cluster jitters
    // are otherwise equidistant from a fresh jitter direction
    val delta = emb(
      20L -> vec(7, 0.0501, 1),
      30L -> vec(200, 0.0), 31L -> vec(200, 0.0))
    val incr = edgeSet(KnnGraph.deltaGraph(old, delta, k = 2))
    val rebuild = edgeSet(KnnGraph.graph(old.unionAll(delta), k = 2))
    assert(incr == rebuild)
    // the near-clone displaced into rank 1 of node 0 (cos ~ 1.0 beats the
    // in-cluster jittered neighbors)
    assert(incr.exists(e => e._1 == 0L && e._2 == 1L && e._3 == 20L))
    // new node attached to the old cluster, its aligned source at rank 1
    assert(incr.exists(e => e._1 == 20L && e._2 == 1L && e._3 == 0L))
    // the new-new identical pair found each other at cos 1.0
    assert(incr.exists(e => e._1 == 30L && e._3 == 31L && e._4 == 1.0))
  }

  test("untouched far nodes keep their frozen edges verbatim") {
    val old = emb(
      0L -> vec(7, 0.05, 1), 1L -> vec(7, 0.05, 2),
      10L -> vec(55, 0.05, 4), 11L -> vec(55, 0.05, 5))
    val delta = emb(20L -> vec(7, 0.001, 6))
    val frozen = edgeSet(KnnGraph.graph(old, k = 2))
    val incr = edgeSet(KnnGraph.deltaGraph(old, delta, k = 2))
    // the {10,11} region shares no bucket with the delta (different base
    // region), so its rows pass through bit-identically
    val farFrozen = frozen.filter(e => e._1 >= 10L && e._1 < 20L)
    val farIncr = incr.filter(e => e._1 >= 10L && e._1 < 20L)
    assert(farFrozen.nonEmpty && farIncr == farFrozen)
  }

  test("whole-graph equality on a seeded random corpus") {
    val rows = (0L until 48L).map { i =>
      (i, Array.tabulate(Similarity.Dim)(d =>
        (Similarity.planeWeight(3000 + i.toInt, d) * 2).toFloat))
    }
    val all = emb(rows: _*)
    val old = all.filter($"vec_id" % 5 =!= 0)
    val delta = all.filter($"vec_id" % 5 === 0)
    assert(edgeSet(KnnGraph.deltaGraph(old, delta)) ==
      edgeSet(KnnGraph.graph(all)))
  }
}
