package graft

/** Global physical-plan invariant over EVERY driver-contract query: no
  * nested-loop and no cartesian join anywhere — the two shapes that are
  * correct at test scale and dead at 100 TB. The single exemption is
  * ann_brute_force, whose broadcast nested loop against the tiny query set
  * IS the operator (the exact top-k baseline that verifies the LSH path).
  *
  * This is the regression guard for the round-1 finding where a declared
  * query (dedup_embedding) silently planned as BroadcastNestedLoopJoin.
  */
class PlanAuditSpec extends SparkSpec {

  // Allowed BroadcastNestedLoopJoin OCCURRENCES per query (0 for everyone
  // else) — the exemption is counted, not query-wide, so a regression adding
  // a data-sized nested loop to an exempted query still fails.
  // ann_brute_force: the broadcast nested loop against the tiny query set IS
  // the exact-baseline operator (1). ann_ivf: vectors and queries each score
  // against the ENTIRE coarse codebook by definition (argmin over K) — two
  // broadcast cross joins over a constant-size (KBs) side (2).
  // emb_kmeans_step: the Lloyd assignment is the same argmax-over-codebook
  // scan as ann_ivf's, once (1). text_tfidf: the corpus-cardinality N joins
  // in as a broadcast SINGLE-ROW aggregate (1). q_bloom_join: the bloom
  // bitmap joins in as a broadcast SINGLE-ROW 8 KiB map (1).
  // ann_ivf_pq: the same two coarse-codebook scans as ann_ivf (assign +
  // probe); the PQ fine stage itself is broadcast-hash equi-joins only (2).
  // ann_ivf_pq_res_trained: same two coarse-codebook scans as ann_ivf_pq_res
  // (assign + probe); the residual training pass is broadcast-hash only (2).
  // ann_ivf_trained: ann_ivf's two coarse-codebook scans plus the Lloyd
  // training assignment (emb_kmeans_step's scan) over the SAME constant-size
  // broadcast codebook (3). dedup_semantic: one emb_kmeans_step-style
  // argmax over the constant-size broadcast codebook (1); the pairwise
  // stage itself is an equi-join on cid. q_cms_join_size: the SINGLE-ROW
  // estimate and truth aggregates combine via a broadcast single-row
  // cross join (the text_tfidf shape) (1). q_kmv_overlap: the group-PAIR
  // expansion (type_a < type_b over the distinct-group domain — pairs is
  // the operator's output domain, quadratic in GROUPS by definition,
  // never in data) appears once per union side (2).
  private val allowedNestedLoops = Map("ann_brute_force" -> 1, "ann_ivf" -> 2,
    "ann_ivf_pq" -> 2, "ann_ivf_pq_res" -> 2, "ann_ivf_pq_res_trained" -> 2,
    "ann_ivf_trained" -> 3,
    "emb_kmeans_step" -> 1, "text_tfidf" -> 1, "q_bloom_join" -> 1,
    "dedup_semantic" -> 1, "q_cms_join_size" -> 1, "q_kmv_overlap" -> 2,
    // text_surprisal: the corpus-total single-row broadcast into the vocab
    // projection (text_tfidf's shape) (1)
    "text_surprisal" -> 1)
  test("no driver query plans a cartesian or nested-loop join") {
    // eager (streaming/iterative) queries are skipped via the ONE shared
    // exclusion set — see SparkEntry.eagerQueries for the rationale
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => SparkEntry.eagerQueries.contains(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        val nested = bnlj > allowedNestedLoops.getOrElse(name, 0)
        val cartesian = plan.contains("CartesianProduct")
        if (nested || cartesian) Some(name) else None
      }
    assert(offenders.isEmpty, s"scale-killer joins in: $offenders")
  }

  test("parquet scans prune columns: no query reads full events/documents rows") {
    // ReadSchema in every scan must be narrower than the full table schema
    // (documents carries ~10 columns incl. text+media; events carries props)
    val widest = Seq("mqtt_messages", "text_token_stats", "mm_metadata")
    widest.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(readSchemas.nonEmpty, s"$name: no file scan found\n$plan")
      readSchemas.foreach { s =>
        val cols = s.split(",").length
        assert(cols <= 6, s"$name reads $cols columns: $s")
      }
    }
  }
}
