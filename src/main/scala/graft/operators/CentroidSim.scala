package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Label-centroid similarity matrix — the class-geometry instrument behind
  * label-quality review and coarse-quantizer design: the pairwise cosine
  * between per-label mean vectors. Near-colinear centroids flag label
  * pairs a router or classifier will confuse (and IVF cells that should
  * merge); the embedding-space analogue of the corpus-drift report.
  *
  * Scale shape: one narrow posexplode and ONE map-side-combined shuffle
  * collapsing to |labels|·|dims| rows (the EmbDimStats shape) — the only
  * corpus-sized work. Everything downstream (centroid self-join on dim,
  * norm aggregates, the pair matrix) operates on that tiny table;
  * |labels|² rows total.
  *
  * Exactness: per-element micro floors are bit-equal cross-engine (IEEE
  * double multiply); per-(label, dim) sums are integer, accumulated in
  * DECIMAL(38,0) for headroom then cast back (the EmbDimStats
  * discipline). Centroid coordinates are the OFFSET-SHIFTED integer
  * division `(S + 2e6·n) div n − 2e6` — the shift makes the numerator
  * non-negative (elements are micro-bounded far below 2e6), so Spark's
  * truncating `div` and DuckDB's flooring `//` agree exactly even where
  * the mean is negative. Dot products and squared norms are then integer
  * sums over |dims| terms (bounded ≪ int64); the final cosine converts
  * the three exact integers to double ONCE in a fixed association —
  * `(dot / (sqrt(n2a)·sqrt(n2b)))·1e6` — where every IEEE op is
  * correctly-rounded and therefore identical in both engines.
  */
object CentroidSim {

  /** Offset making the centroid-mean numerator non-negative; valid while
    * per-element |micro| < 2e6, i.e. |x| < 2.0 (driver embeddings are
    * unit-scale, |x| ≤ ~0.6).
    */
  val MeanOffset = 2000000L

  /** (label_a, label_b, n_a, n_b, cos_ppm) for every unordered label pair
    * (a < b), ordered by (label_a, label_b).
    */
  def matrix(emb: DataFrame): DataFrame = {
    val cents = Caching.cached(
      emb.select(col("label").cast("int").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1e6).cast("long").as("m"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("m").cast("decimal(38,0)")).cast("long").as("s"))
        .select(col("label"), col("dim"), col("n"),
          expr(s"(s + ${MeanOffset} * n) div n - ${MeanOffset}").as("c")))
    // everything below the corpus shuffle operates on the |labels|·|dims|
    // table — broadcastable BY CONSTRUCTION (both factors are small
    // constants), but it sits behind the cache's RDD scan where Spark has
    // no size statistics, so the hints are explicit
    val norms = cents.groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"), sum(col("c") * col("c")).as("n2"))
    val dots = cents.as("a")
      .join(broadcast(cents.as("b")),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    dots
      .join(broadcast(norms.select(col("label").as("label_a"),
        col("n_vecs").as("n_a"), col("n2").as("n2a"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"),
        col("n_vecs").as("n_b"), col("n2").as("n2b"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        when(col("n2a") === 0L || col("n2b") === 0L, 0L)
          .otherwise(floor((col("dot").cast("double") /
            (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
            * 1e6).cast("long"))
          .as("cos_ppm"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Driver query: the centroid cosine matrix of the embeddings table. */
  def matrixEmbeddings(spark: SparkSession, dir: String): DataFrame =
    matrix(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[CentroidSim]] — same micro floors, same
  * offset-shifted integer centroids, same fixed-association cosine.
  */
object CentroidSimSql {

  val matrixEmbeddingsSql: String =
    s"""WITH m AS (
       |  SELECT CAST(label AS INT) AS label, CAST(i - 1 AS INT) AS dim,
       |    CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS m
       |  FROM (SELECT label, unnest(embedding) AS x,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |cents AS (
       |  SELECT label, dim, count(*) AS n,
       |    (CAST(sum(m) AS BIGINT) + ${CentroidSim.MeanOffset} * count(*))
       |      // count(*) - ${CentroidSim.MeanOffset} AS c
       |  FROM m GROUP BY 1, 2),
       |norms AS (
       |  SELECT label, max(n) AS n_vecs, CAST(sum(c * c) AS BIGINT) AS n2
       |  FROM cents GROUP BY 1),
       |dots AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |    CAST(sum(a.c * b.c) AS BIGINT) AS dot
       |  FROM cents a JOIN cents b ON a.dim = b.dim AND a.label < b.label
       |  GROUP BY 1, 2)
       |SELECT label_a, label_b, na.n_vecs AS n_a, nb.n_vecs AS n_b,
       |  CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN 0
       |       ELSE CAST(floor((CAST(dot AS DOUBLE) /
       |         (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))))
       |         * 1000000) AS BIGINT) END AS cos_ppm
       |FROM dots
       |JOIN norms na ON na.label = label_a
       |JOIN norms nb ON nb.label = label_b
       |ORDER BY label_a, label_b""".stripMargin
}
