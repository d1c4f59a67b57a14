package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From near-dup PAIRS to a dedup KEEP-LIST: connected components over the
  * pair graph, each document labeled with its cluster representative (the
  * minimum doc_id in its component — deterministic, engine-independent), and
  * a kept/dropped verdict. This is the half of dedup that pair generation
  * alone doesn't give you: A~B and B~C must collapse to ONE survivor even
  * when A~C was never emitted as a pair.
  *
  * Algorithm: iterative min-label propagation. Each round every node takes
  * the min of its own label and its neighbors' labels — a join + groupBy per
  * round, all distributed; the driver only checks the convergence count
  * (control flow, not data flow). Rounds needed = component diameter, and
  * near-dup components are shallow (stars around a template/boilerplate
  * document), so this converges in a handful of rounds where a general
  * billion-edge graph would want the large-star/small-star variant. A
  * `maxIters` bound caps pathological chains; hitting it raises rather than
  * returning silently-wrong labels.
  *
  * The oracle (see [[DedupClustersSql]]) re-derives the same labels with a
  * DuckDB RECURSIVE CTE (min reachable node over the symmetric edge set) —
  * an independent fixpoint formulation cross-checking the propagation.
  */
object DedupClusters {

  /** Sizing target for the propagation shuffle: (long, long) edge rows are
    * ~16 bytes, so 250k edges per reducer is a few MB — far below executor
    * memory, high enough that reducers aren't scheduler noise.
    */
  val TargetEdgesPerPartition = 250000L

  /** Shuffle width for the propagation rounds: explicit when given, else
    * edge-count / [[TargetEdgesPerPartition]], clamped to [8, session width].
    * The pair graph is usually orders of magnitude smaller than the corpus,
    * so the rounds get a narrow shuffle locally (8 for anything under 2M
    * edges — near-empty reducers are pure scheduler overhead per round); a
    * billion-edge graph on a real cluster widens up to the session's
    * configured `spark.sql.shuffle.partitions`, which stays the operator's
    * ceiling because it is the deployment's statement of cluster size.
    */
  def propagationPartitions(edgeCount: Long, sessionWidth: Int,
      explicit: Option[Int]): Int = explicit.getOrElse {
    val bySize = ((edgeCount + TargetEdgesPerPartition - 1) /
      TargetEdgesPerPartition).toInt
    // session width is the OUTER clamp: a deployment configured narrower
    // than the 8-partition floor keeps its stated ceiling
    math.min(sessionWidth, math.max(8, bySize))
  }

  /** Pair-count ceiling for the driver fast path: 1M (long, long) pairs is
    * ~16 MB on the driver — far under any driver heap, far over any
    * realistic near-dup pair graph at test scale.
    */
  val DriverMaxPairs: Long = 1L << 20

  /** (doc_id, cluster_id, kept) for every document in `pairs`
    * (columns `doc_a`, `doc_b`).
    *
    * Size-switched execution (the pair COUNT is known before choosing — one
    * count over the cached pair frame): below [[DriverMaxPairs]] the
    * component labeling runs as union-find on the driver — a handful of
    * distributed jobs each costing more in scheduling + plan compilation
    * than the entire sub-second union-find would, the same runtime-size
    * reasoning AQE applies to join strategies. Above it (or when an
    * explicit shuffle width demands the distributed shape) the min-label
    * propagation with pointer jumping runs as before. Both paths produce
    * IDENTICAL labels (component-minimum representative) and are checked by
    * the same DuckDB RECURSIVE CTE oracle.
    *
    * @param shufflePartitions shuffle width for the propagation rounds;
    *   derived from the pair-graph size via [[propagationPartitions]] when
    *   not given. Passing a width also forces the distributed path.
    * @param driverMaxPairs fast-path ceiling (tests pass 0 to force the
    *   distributed path at unit scale).
    */
  def components(pairs: DataFrame, maxIters: Int = 15,
      shufflePartitions: Option[Int] = None,
      driverMaxPairs: Long = DriverMaxPairs): DataFrame = {
    val spark = pairs.sparkSession
    // materialize the pair frame ONCE: nodes, both edge directions, and the
    // self-loops all re-reference it, and the upstream pair generation (a
    // whole LSH pipeline) must not re-run per reference. Ids normalize to
    // long up front so both execution paths emit the same schema (and the
    // driver path's getLong cannot see an int-typed input).
    val (p, pHandle) = Caching.cachedWithHandle(pairs.select(
      col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b")))
    val pairCount = p.count()
    if (shufflePartitions.isEmpty && pairCount <= driverMaxPairs) {
      // driverComponents collects eagerly and returns a local relation, so
      // the pair cache has no remaining reader — release it (also on the
      // exception path) rather than letting repeated components() calls
      // accumulate blocks until GC
      try return driverComponents(spark, p)
      finally pHandle.unpersist(blocking = false)
    }
    val nodes = p.select(col("doc_a").as("node"))
      .unionAll(p.select(col("doc_b").as("node"))).distinct()
    val (edges, edgesHandle) = Caching.cachedWithHandle(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .unionAll(nodes.select(col("node").as("src"), col("node").as("dst"))))
    var (labels, labelsHandle) =
      Caching.cachedWithHandle(nodes.select(col("node"), col("node").as("label")))
    // materialize the graph under the session's full parallelism; the
    // propagation rounds then run on a frame that is node-count-sized (the
    // PAIR graph, not the corpus), so they get a small shuffle width —
    // 32 near-empty reducers per round would be pure scheduler overhead
    val edgeCount = edges.count()
    labels.count()
    // one propagation round, built lazily (name-based joins so chained
    // rounds self-join cleanly): neighbor-min, then one pointer jump
    // (label := label of label) — path lengths halve per round, so rounds
    // are O(log diameter) instead of diameter
    def round(lbl: DataFrame): DataFrame = {
      val byDst = lbl.select(col("node").as("dst"), col("label"))
      val nm = edges.join(byDst, Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("label")).as("label"))
      val byLabel = lbl.select(col("node").as("label"), col("label").as("label2"))
      nm.join(byLabel, Seq("label"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("label2"), col("label"))).as("label"))
    }
    // materialization is the expensive part at any scale (a barrier + cache
    // per round), so `unroll` rounds chain lazily into ONE job between
    // barriers; convergence is a fixpoint test (no edge may still see a
    // smaller neighbor label), one count over the cached result
    val unroll = 3
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    val width = propagationPartitions(edgeCount, prevShuffle.toInt, shufflePartitions)
    var converged = false
    var iter = 0
    try {
      try {
        spark.conf.set(shuffleKey, width.toString)
        while (!converged && iter < maxIters) {
          val chained = (1 to unroll).foldLeft(labels)((l, _) => round(l))
          val (next, nextHandle) = Caching.cachedWithHandle(chained)
          val s = next.select(col("node").as("src"), col("label").as("slabel"))
          val d = next.select(col("node").as("dst"), col("label").as("dlabel"))
          val violations = edges.join(s, Seq("src")).join(d, Seq("dst"))
            .filter(col("dlabel") < col("slabel")).limit(1).count()
          // `next` is materialized (the count above) — the superseded batch's
          // cache can be released now instead of waiting for GC
          labelsHandle.unpersist(blocking = false)
          labels = next
          labelsHandle = nextHandle
          converged = violations == 0L
          iter += 1
        }
      } finally spark.conf.set(shuffleKey, prevShuffle)
      require(converged,
        s"component propagation did not converge in ${maxIters * unroll} rounds")
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id"),
        (col("node") === col("label")).as("kept"))
    } finally {
      // the final labels are materialized (the convergence count), so the
      // pair frame and edge graph have no remaining reader on ANY exit —
      // release them eagerly. On success the labels cache stays: it backs
      // the returned frame, and its RDD-owned blocks are reclaimed by
      // ContextCleaner once the result is garbage-collected (the Caching
      // contract; an evicted label partition recomputes through the
      // unpersisted lineage — correct, just slower). On failure it has no
      // reader and is released too.
      pHandle.unpersist(blocking = false)
      edgesHandle.unpersist(blocking = false)
      if (!converged) labelsHandle.unpersist(blocking = false)
    }
  }

  /** Driver fast path: union-find with the smaller root winning, so each
    * component's root IS its minimum id — the same labels the distributed
    * propagation converges to. Path compression keeps finds near-constant.
    */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
      p: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    p.collect().foreach { row =>
      val a = row.getLong(0)
      val b = row.getLong(1)
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)](parent.size)
    parent.keySet.forEach { n => val r = find(n); out += ((n, r, n == r)) }
    out.toSeq.toDF("doc_id", "cluster_id", "kept")
  }

  /** Incremental keep-list maintenance: relabel after a recrawl WITHOUT
    * recomputing the old snapshot's pair graph. The old (doc_id,
    * cluster_id) label frame collapses each old component to its STAR —
    * edges (cluster_id, doc_id), one per labeled doc, roots as self-loops —
    * which preserves exactly the old pair set's connectivity and its
    * component minima (the representative IS the min id, so the star
    * center is the min). Unioning the delta pairs and re-running
    * [[components]] therefore yields labels IDENTICAL to a from-scratch
    * rebuild over (old pairs ∪ delta pairs): delta docs attach to existing
    * clusters, delta pairs bridging two old clusters merge them (both
    * stars adopt the smaller minimum), untouched clusters relabel to
    * themselves. Equivalence pinned adversarially in DedupDeltaSpec; the
    * driver oracle recomputes the rebuild side on real data.
    *
    * Scale: the star frame is |labeled docs| rows — the PAIR-GRAPH-sized
    * input [[components]] is already designed for (size-switched driver
    * fast path / distributed propagation), and near-dup components
    * converge in a handful of rounds regardless of which side the edges
    * came from. The representative is the component MINIMUM id —
    * determinism is the contract, not keep-policy: a delta doc with a
    * smaller id (e.g. a negated mirror probe) becomes the new
    * representative, and a keep-policy layer (e.g. [[Dedup.keepBest]]'s
    * quality ranking) decides survivorship downstream.
    */
  def incremental(oldLabels: DataFrame, deltaPairs: DataFrame,
      maxIters: Int = 15): DataFrame =
    components(
      oldLabels.select(col("cluster_id").as("doc_a"), col("doc_id").as("doc_b"))
        .unionAll(deltaPairs.select(col("doc_a"), col("doc_b"))),
      maxIters)

  /** Cluster-size histogram over a [[components]] label frame — the
    * keep-list health profile: how many clusters of each size the pair
    * graph collapses into (n_docs = size x clusters reconciles against
    * the label count). A fat tail here means a near-universal template is
    * chaining unrelated documents through shared boilerplate — the signal
    * to tighten the pair threshold before the keep-list deletes half the
    * corpus. Two map-side-combined aggregations over (doc_id, cluster_id)
    * rows; the histogram domain is bounded by the largest cluster.
    */
  def sizeHistogram(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy(col("cluster_size"))
}

/** DuckDB oracle for [[DedupClusters]]: min reachable node via RECURSIVE CTE
  * over the symmetric edges of a pairs CTE named `pairs(doc_a, doc_b)`.
  */
object DedupClustersSql {

  /** Mirror of [[DedupClusters.sizeHistogram]] over [[componentsSql]]'s
    * labels — the keep-list health profile.
    */
  def sizeHistogramSql(pairsCte: String): String =
    s"""SELECT cluster_size, count(*) AS n_clusters,
       |  cluster_size * count(*) AS n_docs
       |FROM (
       |  SELECT cluster_id, count(*) AS cluster_size
       |  FROM (${componentsSql(pairsCte)}) labels
       |  GROUP BY cluster_id) sizes
       |GROUP BY cluster_size
       |ORDER BY cluster_size""".stripMargin

  def componentsSql(pairsCte: String): String =
    s"""WITH RECURSIVE $pairsCte,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node)
       |SELECT node AS doc_id, min(label) AS cluster_id,
       |       node = min(label) AS kept
       |FROM reach GROUP BY node
       |ORDER BY doc_id""".stripMargin
}
