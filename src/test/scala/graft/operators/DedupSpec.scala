package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Scale-shape guarantees of the dedup operators: the quadratic paths the
  * brief forbids must be structurally absent (no nested-loop/cartesian in the
  * plan), and the skew caps must bound synthetic mega-buckets.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def embeddings(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(Similarity.Dim)(d =>
        (Similarity.planeWeight(100 + i, d) * 2).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("embeddingNearDup plan is LSH-bucketed: no nested-loop join, no cartesian") {
    val df = Dedup.embeddingNearDup(Dedup.probeAugmented(embeddings(32)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("probe-augmented embedding near-dup finds the planted pairs (non-vacuous)") {
    val out = Dedup.embeddingNearDup(Dedup.probeAugmented(embeddings(32)))
      .select($"vec_a", $"vec_b", $"cos").as[(Long, Long, Double)].collect()
    // every exact copy must surface with cos rounded to 1.0: identical
    // vectors share every LSH bucket, so recall here is structural, not lucky
    val exact = out.filter { case (a, b, _) => a < 1000000L && b == a + 1000000L }
    assert(exact.length == 4)
    assert(exact.forall(_._3 == 1.0))
    assert(out.forall { case (a, b, c) => a < b && c >= 0.95 })
  }

  test("passageDups finds aligned shared chunks and ignores sub-width tails") {
    val shared = (0 until Dedup.PassageTokens).map(i => s"p$i").mkString(" ")
    val corpus = docs(
      1L -> s"$shared a1 a2 a3 a4 a5 a6 a7 a8", // chunk 0 = shared
      2L -> s"$shared b1 b2 b3 b4 b5 b6 b7 b8", // chunk 0 = shared
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8", // unique chunk
      4L -> "tiny tail only", // < width -> filtered entirely
      5L -> s"d1 d2 d3 d4 d5 $shared") // 5-token prefix: shared text UNALIGNED -> no match
    val got = Dedup.passageDups(corpus)
      .select($"n_docs", $"n_occ", $"first_doc").as[(Long, Long, Long)].collect()
    // exactly one duplicated passage: the aligned shared chunk in docs 1+2
    assert(got.toSeq == Seq((2L, 2L, 1L)), got.toSeq)
  }

  test("passageDups counts within-doc repeats in n_occ but requires 2 distinct docs") {
    val chunk = (0 until Dedup.PassageTokens).map(i => s"r$i").mkString(" ")
    // doc 1 repeats the chunk twice (both aligned); no second doc has it
    val got = Dedup.passageDups(docs(1L -> s"$chunk $chunk")).count()
    assert(got == 0L)
    // add a second doc: now it's a dup with n_occ = 3
    val got2 = Dedup.passageDups(docs(1L -> s"$chunk $chunk", 2L -> chunk))
      .select($"n_docs", $"n_occ").as[(Long, Long)].collect()
    assert(got2.toSeq == Seq((2L, 3L)))
  }

  test("minhashLsh bounds a synthetic mega-bucket; the cap is not silent") {
    // 80 identical docs: one band bucket of size 80 > MaxBucket=64 in every
    // band -> all dropped from candidate generation (they belong to exact
    // dedup); plus one genuine near-dup pair that must still surface
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val changed = ((0 until 29).map(i => s"w$i") :+ "x29").mkString(" ")
    // clone tokens are disjoint from the pair's, so the mega-bucket and the
    // genuine pair never share a band bucket
    val cloneText = (0 until 30).map(i => s"k$i").mkString(" ")
    val clones = (0L until 80L).map(i => (i, cloneText))
    val pair = Seq((100L, base), (101L, changed))
    var dropped = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
        val m = qe.observedMetrics.get("minhash_lsh_caps")
        m.foreach(row => dropped = row.getLong(0))
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Dedup.minhashLsh(docs(clones ++ pair: _*))
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(out == Set((100L, 101L))) // mega-bucket contributed zero pairs
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (dropped < 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(dropped == 80L * Dedup.Bands) // every clone row, every band — observed
    } finally spark.listenerManager.unregister(listener)
  }

  test("the LSH bucket cap is exact at its edge: cap kept, cap+1 dropped") {
    // the boundary certification behind the capGroups skew bound: a bucket
    // of EXACTLY MaxBucket members passes intact (all C(cap,2) pairs
    // surface, zero drops observed), one more member and the whole bucket
    // is dropped (zero pairs, every row observed dropped) — the cap is a
    // step function at cap, not "approximately bounded"
    val cloneText = (0 until 30).map(i => s"c$i").mkString(" ")
    // a genuine near-dup pair on disjoint tokens rides along so the result
    // is never empty — an all-empty result lets AQE's empty-relation
    // propagation skip the metric-carrying subtree and the observation is
    // never delivered (the cap+1 case would otherwise return zero rows)
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val changed = ((0 until 29).map(i => s"w$i") :+ "x29").mkString(" ")
    val pair = Seq((1000000L, base), (1000001L, changed))
    def run(nClones: Long): (Set[(Long, Long)], Long) = {
      var dropped = -1L
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
          val m = qe.observedMetrics.get("minhash_lsh_caps")
          m.foreach(row => dropped = row.getLong(0))
        }
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val clones = (0L until nClones).map(i => (i, cloneText))
        val out = Dedup.minhashLsh(docs(clones ++ pair: _*))
          .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
        val deadline = System.currentTimeMillis() + 10000
        while (dropped < 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        (out, dropped)
      } finally spark.listenerManager.unregister(listener)
    }
    val cap = Dedup.MaxBucket.toLong
    val pairRow = (1000000L, 1000001L)
    val (atCap, droppedAtCap) = run(cap)
    assert(atCap.size == cap * (cap - 1) / 2 + 1,
      s"a bucket of exactly cap=$cap must keep ALL its pairs, got ${atCap.size}")
    assert(atCap.contains((0L, 1L)) && atCap.contains((0L, cap - 1))
      && atCap.contains(pairRow))
    assert(droppedAtCap == 0L, s"cap-sized bucket reported drops: $droppedAtCap")
    val (overCap, droppedOverCap) = run(cap + 1)
    assert(overCap == Set(pairRow),
      s"a bucket of cap+1 must contribute zero candidates, got ${overCap.size}")
    assert(droppedOverCap == (cap + 1) * Dedup.Bands,
      s"expected every clone row observed dropped in every band, got $droppedOverCap")
  }

  test("exact dedup is where the clone cluster lands") {
    val clones = (0L until 80L).map(i => (i, "same text here"))
    val out = Dedup.exact(docs(clones :+ (200L, "other") : _*))
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 80L), (200L, 1L)))
  }

  test("fuzzyDups finds head- and tail-edited twins and rejects far pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa zz"), // tail edit, dist 3
      (3L, "zz alpha beta gamma delta epsilon zeta eta theta iota kappa"), // head edit, dist 3
      (4L, "totally different words that share no prefix or suffix at all"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta omega psi chi phi")
      // 5 shares doc 1's 8-token head block but is 9+ edits away: the
      // candidate must be generated, then rejected by the distance gate
    ).toDF("doc_id", "text")
    val got = Dedup.fuzzyDups(docs)
      .select($"doc_a", $"doc_b", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    // (1,2) via the shared head block, (1,3) via the shared tail block;
    // (2,3) shares NEITHER block (head and tail both differ) — the
    // documented recall boundary for edits in both halves. (2,5) IS a
    // candidate (shared head, length within 4) and must be rejected by
    // the distance gate; (1,5)/(3,5) die at the length pre-filter.
    assert(got == Set((1L, 2L, 3), (1L, 3L, 3)))
  }

  test("fuzzyDups driver query is non-vacuous: probes survive at sf0.001") {
    import spark.implicits._
    val got = Dedup.fuzzyDups(
      Dedup.fuzzyProbeAugmented(graft.sources.Tables.documents(spark, sf0001)))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // every planted twin pairs with its source (tail probes: +1e6;
    // head probes: +2e6)
    val tailProbes = got.collect { case (a, b) if b == a + 1000000L => a }
    val headProbes = got.collect { case (a, b) if b == a + 2000000L => a }
    assert(tailProbes.nonEmpty && headProbes.nonEmpty, got)
  }

  test("ngramJaccard drops corpus-hot shingles but keeps real near-dups") {
    // 130 docs whose ONLY shared content is one hot trigram (df=132 > 128):
    // after the cap they share nothing -> no pairs from the hot shingle
    val hotDocs = (0L until 130L).map { i =>
      (i, s"hot common gram a$i b$i c$i d$i e$i f$i g$i")
    }
    // one genuine near-dup pair on non-hot shingles
    val base = (0 until 20).map(i => s"u$i").mkString(" ")
    val near = ((0 until 19).map(i => s"u$i") :+ "z").mkString(" ")
    val out = Dedup.ngramJaccard(docs(hotDocs ++ Seq((500L, base), (501L, near)): _*))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((500L, 501L)))
  }
}
