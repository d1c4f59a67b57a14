package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF, VectorSql => VS}
import graft.sources.Tables

/** Approximate k-nearest-neighbor GRAPH over the whole embedding corpus —
  * the primitive under graph-based near-dup clustering, label propagation,
  * and diversity-aware selection: every vector gets its k most-cosine-
  * similar bucket-mates as directed edges. Unlike the `ann_*` query
  * operators (few probe vectors against a corpus), this is all-corpus
  * self-similarity — the regime where brute force is O(n²) and the
  * bucketed candidate set is the whole game.
  *
  * The candidate stage IS [[Dedup.lshCandidatePairs]] verbatim (the
  * embedding near-dup machinery: multi-table sign-LSH, pairs deduped
  * across tables BEFORE any cosine work), so each undirected candidate
  * pair pays the [[VF.dot]] fold exactly once and then feeds BOTH
  * directions of the graph.
  *
  * Scale shape: candidates are bucket-bounded (never all-pairs); the
  * per-vector top-k window partitions on the HIGH-CARDINALITY vec_id, so
  * no per-group data skew; norms are computed once per vector below the
  * join. Recall is the LSH trade the near-dup family already documents —
  * a vector's true neighbor missing every shared bucket is absent from
  * its edge list, identically in both engines (same deterministic
  * hyperplanes), so the approximation itself is certified.
  */
object KnnGraph {

  /** Edges per vector. */
  val K = 3

  /** (vec_id, rank, nbr_id, cos): the directed kNN edge list.
    *
    * `planes` picks the LSH collision regime the edges are drawn from
    * (the [[Similarity.tableBucket]] trade): 6-plane buckets for the
    * near-dup analysis graph (the `ann_knn_graph` artifact), 4-plane for
    * a NAVIGABLE serve graph whose edges span ordinary top-k distances
    * ([[GraphSearch.ServeGraphK]] — a near-dup-only edge set strands a
    * beam walk in its seed neighborhood; measured recall 0.200 vs 0.9+).
    */
  def graph(emb: DataFrame, k: Int = K,
      tables: Int = Dedup.NearDupTables,
      planes: Int = Similarity.NumPlanes): DataFrame =
    graphEdges(emb, k, tables, planes)
      .select(col("vec_id"), col("rank"), col("nbr_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_id"), col("rank"))

  /** The UNROUNDED top-k edge frame — the seam the incremental update
    * freezes from: the persisted artifact stores full-precision cosines
    * (the 6-dp rounding is the oracle-diff convention, applied at the
    * query surface), so re-ranking frozen edges against fresh delta
    * scores never mixes precisions.
    */
  private[operators] def graphEdges(emb: DataFrame, k: Int,
      tables: Int, planes: Int): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      VF.norm(col("embedding")).as("nrm"))
    // scored feeds BOTH directions of the graph (the unionAll below), so it
    // is cached — without it each direction replays the whole LSH candidate
    // generation and cosine join (observed: 2x the exchanges/joins in plan)
    val scored = Caching.cached(Dedup.lshCandidatePairs(emb, tables, planes)
      .join(withNorm.as("a"), col("vec_a") === col("a.vec_id"))
      .join(withNorm.as("b"), col("vec_b") === col("b.vec_id"))
      .withColumn("nn", col("a.nrm") * col("b.nrm"))
      .withColumn("cos", when(col("nn") === 0.0, 0.0)
        .otherwise(VF.dot(col("a.embedding"), col("b.embedding")) / col("nn")))
      .select(col("vec_a"), col("vec_b"), col("cos")))
    rankDirected(scored, k)
  }

  /** Directed top-k ranking over an undirected scored pair frame — the
    * ONE ranking spelling shared by the full build and the incremental
    * update's re-rank (identical window, identical tie order).
    */
  private[operators] def rankDirected(scored: DataFrame, k: Int): DataFrame = {
    val directed = scored
      .select(col("vec_a").as("vec_id"), col("vec_b").as("nbr_id"), col("cos"))
      .unionAll(scored
        .select(col("vec_b").as("vec_id"), col("vec_a").as("nbr_id"), col("cos")))
    rankEdges(directed, k)
  }

  private[operators] def rankEdges(directed: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    directed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cos"))
  }

  /** Incremental kNN-graph maintenance — the delta form of the
    * `ann_knn_graph` artifact (the r18 `emb_pq_codes_delta` discipline):
    * given the OLD snapshot's frozen edge list and the recrawl's new
    * vectors, produce the updated graph WITHOUT re-pairing the old corpus.
    * Candidates are only the pairs that TOUCH the delta (new-vs-all bucket
    * equi-join — new-old attachments and new-new pairs); old nodes re-rank
    * their frozen edges against the incoming delta scores, so a new vector
    * displaces an old edge exactly where a rebuild would.
    *
    * Incremental ≡ rebuild, EXACTLY: bucket membership is per-vector
    * deterministic, so the old-old candidate set is identical in both
    * builds, and any old pair ranking in the rebuild's top-k for a node
    * must already rank ≤ k among old candidates — i.e. it IS a frozen
    * edge. The driver oracle is therefore the full-rebuild spelling
    * verbatim ([[KnnGraphSql.graphEmbeddingsSql]], same string as
    * `ann_knn_graph`), making the gate itself the equivalence
    * certificate; KnnGraphDeltaSpec pins the displacement/attachment
    * cases adversarially.
    *
    * Scale shape: the O(old²-within-buckets) self-join — the dominant
    * cost of the full build — is never re-run; the delta pays one
    * |delta|-driven bucket join plus a top-(k+delta-degree) re-rank per
    * touched node, and untouched nodes pass through as frozen rows
    * (the window sees k rows for them).
    */
  def deltaGraph(old: DataFrame, delta: DataFrame, k: Int = K,
      tables: Int = Dedup.NearDupTables,
      planes: Int = Similarity.NumPlanes): DataFrame = {
    val frozen = graphEdges(old, k, tables, planes)
      .select(col("vec_id"), col("nbr_id"), col("cos"))
    val all = old.unionAll(delta)
    def bucketsOf(df: DataFrame) = df.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        Similarity.tableBucket(col("embedding"), t, planes) + lit(t.toLong << 32)): _*))
        .as("bk"))
    // pairs touching the delta, normalized (a < b) so a new-new pair seen
    // from both sides collapses before scoring
    val cand = bucketsOf(delta).as("d")
      .join(bucketsOf(all).as("a"),
        col("d.bk") === col("a.bk") && col("d.vec_id") =!= col("a.vec_id"))
      .select(least(col("d.vec_id"), col("a.vec_id")).as("vec_a"),
        greatest(col("d.vec_id"), col("a.vec_id")).as("vec_b"))
      .distinct()
    val withNorm = all.select(col("vec_id"), col("embedding"),
      VF.norm(col("embedding")).as("nrm"))
    val scored = cand
      .join(withNorm.as("a"), col("vec_a") === col("a.vec_id"))
      .join(withNorm.as("b"), col("vec_b") === col("b.vec_id"))
      .withColumn("nn", col("a.nrm") * col("b.nrm"))
      .withColumn("cos", when(col("nn") === 0.0, 0.0)
        .otherwise(VF.dot(col("a.embedding"), col("b.embedding")) / col("nn")))
      .select(col("vec_a"), col("vec_b"), col("cos"))
    val directedNew = scored
      .select(col("vec_a").as("vec_id"), col("vec_b").as("nbr_id"), col("cos"))
      .unionAll(scored
        .select(col("vec_b").as("vec_id"), col("vec_a").as("nbr_id"), col("cos")))
    rankEdges(frozen.unionAll(directedNew), k)
      .select(col("vec_id"), col("rank"), col("nbr_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Driver query: the kNN graph of the embeddings table. */
  def graphEmbeddings(spark: SparkSession, dir: String): DataFrame =
    graph(Tables.embeddings(spark, dir))

  /** Driver query: the incremental update over the snapshot carve — old
    * corpus = the non-added residues, delta = the added ones
    * ([[CorpusDiff.AddedMod]], the recrawl discipline), so old ∪ delta is
    * exactly the full table and the oracle is the rebuild spelling.
    */
  def deltaGraphEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    deltaGraph(emb.filter(col("vec_id") % CorpusDiff.AddedMod =!= 0),
      emb.filter(col("vec_id") % CorpusDiff.AddedMod === 0))
  }
}

/** DuckDB oracle for [[KnnGraph]] — same deterministic hyperplane buckets
  * (the near-dup oracle convention), same undirected-score-then-mirror
  * shape, same (cos desc, nbr_id) rank order.
  */
object KnnGraphSql {

  /** The signatures→edges CTE chain ending at `knn_edges(vec_id, rank,
    * nbr_id, cos)` — shared by the graph-artifact oracle and the
    * graph-search oracle so the serve form probes the IDENTICAL graph.
    */
  def graphCtes(k: Int = KnnGraph.K,
      tables: Int = Dedup.NearDupTables,
      planes: Int = Similarity.NumPlanes): String = {
    val bucketList = (0 until tables)
      .map(t => s"${SimilaritySql.tableBucketSql("embedding", t, planes)} + ${t.toLong << 32}")
      .mkString("[", ",\n  ", "]")
    s"""bucketed AS (
       |  SELECT vec_id, unnest($bucketList) AS bk FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bucketed a JOIN bucketed b ON a.bk = b.bk AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT vec_a, vec_b,
       |         ${VS.cosine("a.embedding", "b.embedding")} AS cos
       |  FROM cand
       |  JOIN embeddings a ON vec_a = a.vec_id
       |  JOIN embeddings b ON vec_b = b.vec_id),
       |directed AS (
       |  SELECT vec_a AS vec_id, vec_b AS nbr_id, cos FROM scored
       |  UNION ALL
       |  SELECT vec_b AS vec_id, vec_a AS nbr_id, cos FROM scored),
       |knn_edges AS (
       |  SELECT vec_id, rank, nbr_id, cos FROM (
       |    SELECT vec_id, nbr_id, cos, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rank
       |    FROM directed)
       |  WHERE rank <= $k)""".stripMargin
  }

  def graphEmbeddingsSql(k: Int = KnnGraph.K,
      tables: Int = Dedup.NearDupTables): String =
    s"""WITH ${graphCtes(k, tables)}
       |SELECT vec_id, rank, nbr_id, round(cos, 6) AS cos
       |FROM knn_edges
       |ORDER BY vec_id, rank""".stripMargin
}
