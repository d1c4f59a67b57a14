package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF, VectorSql => VS}
import graft.sources.Tables

/** Cluster-scoped embedding dedup — the SemDeDup shape [Abbas et al. 2023]:
  * assign every vector to its nearest codebook centroid, compare pairs ONLY
  * within a cluster, and keep one representative (the lowest vec_id) per
  * near-duplicate neighborhood. The published result: pruning
  * semantically-duplicated web documents this way shrinks a pretraining
  * corpus with no quality loss.
  *
  * Complement to [[Dedup.embeddingNearDup]] (random-hyperplane LSH
  * candidates): LSH buckets are probabilistic — a pair can straddle every
  * table — while cluster scoping is the SemDeDup contract itself (pairs in
  * different clusters are BY DEFINITION not compared), so the operator's
  * output is exactly reproducible from the codebook with no recall
  * parameter, which is what lets the oracle certify the full keep/drop
  * decision per vector.
  *
  * Scale shape: the assignment is the IVF/k-means broadcast-codebook
  * argmax — K scored rows per vector produced AND collapsed map-side
  * (partial max_by), one corpus-sized shuffle of (vec_id, cid, embedding).
  * The pairwise stage is quadratic only WITHIN a cluster: at deployment
  * scale K grows as ~sqrt(N) (the paper's regime), bounding each cluster's
  * pair count, and the [[SemanticClusterCap]] guard excludes any cluster
  * the quadratic must not touch — excluded members are REPORTED (kept with
  * `capped = true`), never silently dropped, the observed-not-silent rule
  * every capped dedup here follows. The keep decision is one aggregation
  * over pair endpoints — no driver-side anything.
  */
object SemanticDedup {

  /** Codebook size. 16 at certification scale (the IVF family's constant);
    * ~sqrt(N) at deployment scale.
    */
  val SemanticK = 16

  /** Near-duplicate cosine threshold — [[Dedup]]'s embedding threshold. */
  val SemanticThreshold = 0.95

  /** Clusters larger than this are excluded from the quadratic stage and
    * reported as capped. 512 >> any cluster at certification scale, so the
    * certified path is the uncapped semantics; the guard exists for the
    * skewed-codebook pathology (a dead centroid absorbing the corpus).
    */
  val SemanticClusterCap = 512L

  /** (vec_id, cid, capped, kept) for every vector of `emb`:
    * `kept = false` iff some same-cluster neighbor with cosine >=
    * [[SemanticThreshold]] has a SMALLER vec_id. Survivors are the local
    * minima of the threshold graph — every neighborhood's minimum-id
    * member survives and no two adjacent survivors exist... except across
    * a dropped middleman (a path c–d–e with e < c < d keeps both e and c):
    * single-pass greedy, the deliberate trade against the transitive
    * closure [[DedupClusters]] computes iteratively. Members of capped
    * clusters are kept and flagged.
    */
  def semanticDedup(emb: DataFrame, k: Int = SemanticK,
      threshold: Double = SemanticThreshold,
      cap: Long = SemanticClusterCap, trained: Boolean = false): DataFrame = {
    val withNorm = Similarity.withNormOf(emb)
    // trained = the paper's actual shape (k-means clusters, not an init
    // slice): one exact-integer Lloyd step over the corpus, the same
    // cached KB-sized codebook the trained IVF family shares
    val centroids =
      if (trained) Similarity.trainedCentroidsOf(emb, k)
      else Similarity.centroidsOf(withNorm, k)
    // broadcast-codebook argmax, collapsed by partial max_by BEFORE the
    // shuffle (the kmeansStep form); embedding+norm ride along so the
    // pairwise stage needs no second corpus join. CACHED: the assignment
    // feeds the size census, the output membership, and both self-join
    // sides — uncached, Spark recomputes the corpus-sized argmax pass once
    // per consumer (observed: 6 codebook scans in one plan). Materializing
    // the one-pass assignment before the quadratic stage is what the
    // deployment pipeline does too (SemDeDup clusters once, then prunes).
    val assigned = Caching.cached(assignTo(withNorm, centroids))
    val sizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    // sizes is K rows — broadcast; capped is a per-member flag from it
    val members = assigned.join(broadcast(sizes), Seq("cid"))
      .withColumn("capped", col("n") > cap)
    val paired = members.filter(!col("capped"))
    val dominated = paired.as("a")
      .join(paired.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("nn", col("a.nrm") * col("b.nrm"))
      .filter(when(col("nn") === 0.0, lit(0.0))
        .otherwise(VF.dot(col("a.embedding"), col("b.embedding")) / col("nn"))
        >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    members.select(col("vec_id"), col("cid"), col("capped"))
      .join(dominated.withColumn("__dom", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("capped"),
        (col("capped") || col("__dom").isNull).as("kept"))
  }

  /** The ONE broadcast-codebook argmax spelling (cosine DESC, cid ASC
    * tie-break), shared by the full dedup and the delta form's frozen
    * probe so assignments can never drift.
    */
  private def assignTo(withNorm: DataFrame, centroids: DataFrame): DataFrame =
    withNorm.join(broadcast(centroids))
      .withColumn("nn", col("nrm") * col("cnrm"))
      .withColumn("ccos", when(col("nn") === 0.0, 0.0)
        .otherwise(VF.dot(col("embedding"), col("cvec")) / col("nn")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("embedding"), col("nrm")),
        struct(col("ccos"), (-col("cid")).as("neg_cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.embedding").as("embedding"), col("best.nrm").as("nrm"))

  /** SemDeDup of a recrawl DELTA against FROZEN artifacts — the
    * incremental-maintenance form ([[DedupDelta]]'s discipline on the
    * embedding side): the OLD snapshot's codebook and keep-list are
    * frozen (a deployment re-clusters per snapshot epoch, not per
    * recrawl), delta vectors assign against the frozen codebook, and each
    * delta vector is dropped iff it near-duplicates a KEPT old member of
    * its cluster (`dup_of_old` — the moved-URL/mirror case, id order
    * irrelevant: existing content wins) or a smaller-id delta sibling
    * (the intra-batch greedy rule, [[semanticDedup]]'s spelling).
    *
    * Cap rule at probe time: a cluster whose (old kept + delta) member
    * count exceeds `cap` skips the quadratic and flags its delta members
    * `capped` — the same observed-not-silent guard, sized on what the
    * probe would actually pair against.
    *
    * Scale shape: the old corpus is touched ONCE to materialize the
    * frozen artifacts (at deployment these are read from the snapshot
    * store, not recomputed); the delta pays one broadcast-codebook argmax
    * plus cluster-scoped joins whose old side is the kept-members frame,
    * never the raw old corpus.
    */
  def semanticDedupDelta(old: DataFrame, delta: DataFrame,
      k: Int = SemanticK, threshold: Double = SemanticThreshold,
      cap: Long = SemanticClusterCap): DataFrame = {
    val oldNorm = Similarity.withNormOf(old)
    val centroids = Similarity.centroidsOf(oldNorm, k)
    val oldKept = Caching.cached(
      semanticDedup(old, k, threshold, cap).filter(col("kept"))
        .select(col("vec_id"), col("cid"))
        .join(oldNorm, Seq("vec_id"))
        .select(col("vec_id"), col("cid"), col("embedding"), col("nrm")))
    val deltaAssigned = Caching.cached(
      assignTo(Similarity.withNormOf(delta), centroids))
    // probe-time cluster census: old kept + arriving delta; K-row frame
    val sizes = oldKept.select(col("cid"))
      .unionAll(deltaAssigned.select(col("cid")))
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val dMembers = deltaAssigned.join(broadcast(sizes), Seq("cid"))
      .withColumn("capped", col("n") > cap)
    val dPaired = dMembers.filter(!col("capped"))
    val oldPaired = oldKept.join(broadcast(sizes), Seq("cid"))
      .filter(col("n") <= cap)
    def cosOf(a: String, b: String) = {
      val nn = col(s"$a.nrm") * col(s"$b.nrm")
      when(nn === 0.0, lit(0.0))
        .otherwise(VF.dot(col(s"$a.embedding"), col(s"$b.embedding")) / nn)
    }
    val domOld = dPaired.as("b")
      .join(oldPaired.as("a"), col("a.cid") === col("b.cid"))
      .filter(cosOf("a", "b") >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val domDelta = dPaired.as("a")
      .join(dPaired.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosOf("a", "b") >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    dMembers.select(col("vec_id"), col("cid"), col("capped"))
      .join(domOld.withColumn("__do", lit(true)), Seq("vec_id"), "left")
      .join(domDelta.withColumn("__dd", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("capped"),
        coalesce(col("__do"), lit(false)).as("dup_of_old"),
        (col("capped") || (col("__do").isNull && col("__dd").isNull)).as("kept"))
  }

  /** Driver query: the delta verdicts over the snapshot carve — old
    * corpus = non-added residues ([[CorpusDiff.AddedMod]]), delta = the
    * added ones, PLUS the probes that fire both drop regimes at every
    * scale: mirrors of old members under NEGATED ids (dup_of_old — the
    * raw corpus has no cross-vector pair above threshold) and twins of
    * delta members at a disjoint negative offset (the intra-delta greedy
    * regime; the negative twin wins the min-id rule, dropping its
    * positive source).
    */
  def semanticDedupDeltaDocs(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val old = emb.filter(col("vec_id") % CorpusDiff.AddedMod =!= 0)
    val deltaBase = emb.filter(col("vec_id") % CorpusDiff.AddedMod === 0)
    val mirrors = old.filter(col("vec_id") % CorpusDiff.MirrorMod === 2)
      .select((-col("vec_id")).as("vec_id"), col("embedding"))
    val twins = deltaBase.filter(col("vec_id") % CorpusDiff.MirrorMod === 5)
      .select((-(col("vec_id") + 3000000L)).as("vec_id"), col("embedding"))
    semanticDedupDelta(old, deltaBase.unionAll(mirrors).unionAll(twins))
      .orderBy(col("vec_id"))
  }

  /** Driver query on the probe-augmented corpus (the raw corpus has no
    * pair above threshold — the augmentation is what makes the kept=false
    * branch non-vacuous; see [[Dedup.probeAugmented]]).
    */
  def semanticDedupDocs(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Dedup.probeAugmented(Tables.embeddings(spark, dir)))
      .orderBy(col("vec_id"))

  /** The trained form on the same augmented corpus — cluster boundaries
    * move to the Lloyd-step centroids (assignments and therefore the
    * scoping can differ from the init form; both are certified).
    */
  def semanticDedupDocsTrained(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Dedup.probeAugmented(Tables.embeddings(spark, dir)),
      trained = true)
      .orderBy(col("vec_id"))
}

/** DuckDB oracle for [[SemanticDedup]] — same codebook init, same argmax
  * tie-break (cosine DESC, cid ASC), same cap rule, same keep rule.
  */
object SemanticDedupSql {
  import SemanticDedup._

  def semanticDedupDocsSql(k: Int = SemanticK,
      threshold: Double = SemanticThreshold,
      cap: Long = SemanticClusterCap): String =
    s"""WITH emb_aug AS (
       |  ${DedupSql.probeAugmentedSql()}),
       |cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM emb_aug
       |  WHERE vec_id < $k),
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VS.cosine("e.embedding", "c.cvec")} DESC, c.cid) AS crn
       |    FROM emb_aug e CROSS JOIN cents c)
       |  WHERE crn = 1),
       |sizes AS (SELECT cid, count(*) AS n FROM assigned GROUP BY 1),
       |members AS (
       |  SELECT a.vec_id, a.cid, (s.n > $cap) AS capped
       |  FROM assigned a JOIN sizes s USING (cid)),
       |dominated AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM members a
       |  JOIN members b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |    AND NOT a.capped AND NOT b.capped
       |  JOIN emb_aug ea ON ea.vec_id = a.vec_id
       |  JOIN emb_aug eb ON eb.vec_id = b.vec_id
       |  WHERE ${VS.cosine("ea.embedding", "eb.embedding")} >= $threshold)
       |SELECT m.vec_id, m.cid, m.capped,
       |  (m.capped OR d.vec_id IS NULL) AS kept
       |FROM members m LEFT JOIN dominated d ON m.vec_id = d.vec_id
       |ORDER BY m.vec_id""".stripMargin

  /** Mirror of [[SemanticDedup.semanticDedupDelta]] over the snapshot
    * carve + probe families — same frozen codebook (the OLD snapshot's
    * init slice), same old keep-list derivation (the [[semanticDedupDocsSql]]
    * machinery over the old carve), same probe-time census/cap, same two
    * domination regimes.
    */
  def semanticDedupDeltaDocsSql(k: Int = SemanticK,
      threshold: Double = SemanticThreshold,
      cap: Long = SemanticClusterCap): String = {
    import CorpusDiff.{AddedMod, MirrorMod}
    s"""WITH old_emb AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % $AddedMod <> 0),
       |delta_emb AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % $AddedMod = 0
       |  UNION ALL
       |  SELECT -vec_id, embedding FROM old_emb WHERE vec_id % $MirrorMod = 2
       |  UNION ALL
       |  SELECT -(vec_id + 3000000), embedding FROM embeddings
       |  WHERE vec_id % $AddedMod = 0 AND vec_id % $MirrorMod = 5),
       |cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM old_emb
       |  WHERE vec_id < $k),
       |o_assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VS.cosine("e.embedding", "c.cvec")} DESC, c.cid) AS crn
       |    FROM old_emb e CROSS JOIN cents c)
       |  WHERE crn = 1),
       |o_sizes AS (SELECT cid, count(*) AS n FROM o_assigned GROUP BY 1),
       |o_members AS (
       |  SELECT a.vec_id, a.cid, (s.n > $cap) AS capped
       |  FROM o_assigned a JOIN o_sizes s USING (cid)),
       |o_dominated AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM o_members a
       |  JOIN o_members b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |    AND NOT a.capped AND NOT b.capped
       |  JOIN old_emb ea ON ea.vec_id = a.vec_id
       |  JOIN old_emb eb ON eb.vec_id = b.vec_id
       |  WHERE ${VS.cosine("ea.embedding", "eb.embedding")} >= $threshold),
       |old_kept AS (
       |  SELECT m.vec_id, m.cid FROM o_members m
       |  LEFT JOIN o_dominated d ON m.vec_id = d.vec_id
       |  WHERE m.capped OR d.vec_id IS NULL),
       |d_assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VS.cosine("e.embedding", "c.cvec")} DESC, c.cid) AS crn
       |    FROM delta_emb e CROSS JOIN cents c)
       |  WHERE crn = 1),
       |sizes AS (
       |  SELECT cid, count(*) AS n FROM (
       |    SELECT cid FROM old_kept UNION ALL SELECT cid FROM d_assigned)
       |  GROUP BY 1),
       |d_members AS (
       |  SELECT a.vec_id, a.cid, (s.n > $cap) AS capped
       |  FROM d_assigned a JOIN sizes s USING (cid)),
       |old_paired AS (
       |  SELECT ok.vec_id, ok.cid FROM old_kept ok
       |  JOIN sizes s USING (cid) WHERE s.n <= $cap),
       |dom_old AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM d_members b
       |  JOIN old_paired a ON a.cid = b.cid AND NOT b.capped
       |  JOIN old_emb ea ON ea.vec_id = a.vec_id
       |  JOIN delta_emb eb ON eb.vec_id = b.vec_id
       |  WHERE ${VS.cosine("ea.embedding", "eb.embedding")} >= $threshold),
       |dom_delta AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM d_members a
       |  JOIN d_members b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |    AND NOT a.capped AND NOT b.capped
       |  JOIN delta_emb ea ON ea.vec_id = a.vec_id
       |  JOIN delta_emb eb ON eb.vec_id = b.vec_id
       |  WHERE ${VS.cosine("ea.embedding", "eb.embedding")} >= $threshold)
       |SELECT m.vec_id, m.cid, m.capped,
       |  (do2.vec_id IS NOT NULL) AS dup_of_old,
       |  (m.capped OR (do2.vec_id IS NULL AND dd.vec_id IS NULL)) AS kept
       |FROM d_members m
       |LEFT JOIN dom_old do2 ON m.vec_id = do2.vec_id
       |LEFT JOIN dom_delta dd ON m.vec_id = dd.vec_id
       |ORDER BY m.vec_id""".stripMargin
  }

  /** Trained-codebook mirror: the exact-integer Lloyd-step CTE chain (the
    * trained-IVF oracle's spelling) over the SAME augmented corpus, then
    * the identical scoping/keep machinery.
    */
  def semanticDedupDocsTrainedSql(k: Int = SemanticK,
      threshold: Double = SemanticThreshold,
      cap: Long = SemanticClusterCap): String =
    s"""WITH emb_aug AS (
       |  ${DedupSql.probeAugmentedSql()}),
       |cents0 AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM emb_aug
       |  WHERE vec_id < $k),
       |assigned0 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VS.cosine("e.embedding", "c.cvec")} DESC, c.cid) AS crn
       |    FROM emb_aug e CROSS JOIN cents0 c)
       |  WHERE crn = 1),
       |ex AS (
       |  SELECT a.cid,
       |    generate_subscripts(e.embedding, 1) - 1 AS pos,
       |    CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 1000000) AS BIGINT) AS sv
       |  FROM assigned0 a JOIN emb_aug e USING (vec_id)),
       |km AS (
       |  SELECT cid, pos,
       |    CAST(floor(CAST(sum(sv) AS DOUBLE) / count(*)) AS BIGINT) AS cm
       |  FROM ex GROUP BY cid, pos),
       |cents AS (
       |  SELECT cid, list(CAST(cm AS DOUBLE) / 1000000 ORDER BY pos) AS cvec
       |  FROM km GROUP BY cid),
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${VS.cosine("e.embedding", "c.cvec")} DESC, c.cid) AS crn
       |    FROM emb_aug e CROSS JOIN cents c)
       |  WHERE crn = 1),
       |sizes AS (SELECT cid, count(*) AS n FROM assigned GROUP BY 1),
       |members AS (
       |  SELECT a.vec_id, a.cid, (s.n > $cap) AS capped
       |  FROM assigned a JOIN sizes s USING (cid)),
       |dominated AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM members a
       |  JOIN members b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |    AND NOT a.capped AND NOT b.capped
       |  JOIN emb_aug ea ON ea.vec_id = a.vec_id
       |  JOIN emb_aug eb ON eb.vec_id = b.vec_id
       |  WHERE ${VS.cosine("ea.embedding", "eb.embedding")} >= $threshold)
       |SELECT m.vec_id, m.cid, m.capped,
       |  (m.capped OR d.vec_id IS NULL) AS kept
       |FROM members m LEFT JOIN dominated d ON m.vec_id = d.vec_id
       |ORDER BY m.vec_id""".stripMargin
}
