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

  /** (doc_id, cluster_id, kept) for every document in `pairs`
    * (columns `doc_a`, `doc_b`).
    */
  def components(pairs: DataFrame, maxIters: Int = 15): DataFrame = {
    val spark = pairs.sparkSession
    // materialize the pair frame ONCE: nodes, both edge directions, and the
    // self-loops all re-reference it, and the upstream pair generation (a
    // whole LSH pipeline) must not re-run per reference
    val p = Caching.cached(pairs.select(col("doc_a"), col("doc_b")))
    val nodes = p.select(col("doc_a").as("node"))
      .unionAll(p.select(col("doc_b").as("node"))).distinct()
    val edges = Caching.cached(
      p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .unionAll(nodes.select(col("node").as("src"), col("node").as("dst"))))
    var (labels, labelsHandle) =
      Caching.cachedWithHandle(nodes.select(col("node"), col("node").as("label")))
    // materialize the graph under the session's full parallelism; the
    // propagation rounds then run on a frame that is node-count-sized (the
    // PAIR graph, not the corpus), so they get a small shuffle width —
    // 32 near-empty reducers per round would be pure scheduler overhead
    edges.count()
    labels.count()
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    var converged = false
    var iter = 0
    try {
      spark.conf.set(shuffleKey, "8")
      while (!converged && iter < maxIters) {
        // neighbor-min round ...
        val nm = edges.join(labels, edges("dst") === labels("node"))
          .groupBy(col("src").as("n"))
          .agg(min(col("label")).as("label"))
        // ... plus one pointer jump (label := label of label): path-length
        // halves per round, so rounds = O(log diameter) instead of diameter
        val (next, nextHandle) = Caching.cachedWithHandle(
          nm.as("x").join(labels.as("l"), col("x.label") === col("l.node"), "left")
            .select(col("x.n").as("node"),
              least(col("x.label"), coalesce(col("l.label"), col("x.label"))).as("label")))
        val changed = next.as("n").join(labels.as("o"), Seq("node"))
          .filter(col("n.label") =!= col("o.label")).limit(1).count()
        // `next` is materialized (the count above) — the superseded round's
        // cache can be released now instead of waiting for GC
        labelsHandle.unpersist(blocking = false)
        labels = next
        labelsHandle = nextHandle
        converged = changed == 0L
        iter += 1
      }
    } finally spark.conf.set(shuffleKey, prevShuffle)
    require(converged, s"component propagation did not converge in $maxIters rounds")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"),
      (col("node") === col("label")).as("kept"))
  }
}

/** DuckDB oracle for [[DedupClusters]]: min reachable node via RECURSIVE CTE
  * over the symmetric edges of a pairs CTE named `pairs(doc_a, doc_b)`.
  */
object DedupClustersSql {

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
