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
    val assigned = Caching.cached(withNorm.join(broadcast(centroids))
      .withColumn("nn", col("nrm") * col("cnrm"))
      .withColumn("ccos", when(col("nn") === 0.0, 0.0)
        .otherwise(VF.dot(col("embedding"), col("cvec")) / col("nn")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("embedding"), col("nrm")),
        struct(col("ccos"), (-col("cid")).as("neg_cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.embedding").as("embedding"), col("best.nrm").as("nrm")))
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
