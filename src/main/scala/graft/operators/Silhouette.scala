package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-label cohesion/separation report — the simplified-silhouette
  * decomposition over a labeled embedding corpus: for every vector, its
  * squared distance to its OWN label centroid (a²) and to the NEAREST
  * OTHER centroid (b²); per label, the floored mean of each and the
  * count of vectors sitting closer to a foreign centroid (b² < a² — the
  * would-be reassignments). The clustering-quality scorecard read next
  * to [[CentroidSim]]'s confusability matrix and `emb_outliers`'
  * per-vector screen; the silhouette RATIO is deliberately not emitted
  * (it would put a float division inside an aggregate) — the two exact
  * means carry the same signal.
  *
  * Scale shape: centroids are the shared
  * [[Similarity.milliCentroidVectors]] stage (one map-side-combined
  * corpus shuffle, the `emb_outliers` spelling verbatim); scoring
  * crosses each row with the |labels|-row broadcast centroid table (the
  * counted BNLJ) and folds K candidate distances back to one row per
  * vector with a map-side-combinable min/max — the shuffle carries 3
  * longs per vector; the report is then a |labels|-row fold.
  *
  * Exactness: distances are integer sums of squared milli differences
  * (bit-equal floors); per-label means are non-negative integer `div`;
  * the b²-vs-a² comparison is integer. Long headroom: per-label d² sums
  * bound by ~9e7 per row — safe past 1e10 rows per label.
  */
object Silhouette {

  /** (label, n_vecs, mean_own_d2, mean_other_d2, n_closer_other), milli²
    * distance units, ordered by label.
    */
  def cohesion(emb: DataFrame): DataFrame = {
    val cents = Similarity.milliCentroidVectors(emb)
      .select(col("label").as("clabel"), col("cvec"))
    val sv = transform(col("embedding"),
      x => floor(x.cast("double") * 1e3).cast("long"))
    val perVec = emb.select(col("vec_id"), col("label"), sv.as("sva"))
      .join(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        aggregate(zip_with(col("sva"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("clabel") === col("label"), col("d2"))).as("a2"),
        min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("a2")).as("__sa"), sum(col("b2")).as("__sb"),
        sum(when(col("b2") < col("a2"), 1L).otherwise(0L))
          .as("n_closer_other"))
      .select(col("label"), col("n_vecs"),
        expr("__sa div n_vecs").as("mean_own_d2"),
        expr("__sb div n_vecs").as("mean_other_d2"),
        col("n_closer_other"))
      .orderBy(col("label"))
  }

  /** Driver query: the cohesion report of the embeddings corpus. */
  def cohesionEmbeddings(spark: SparkSession, dir: String): DataFrame =
    cohesion(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[Silhouette]] — same milli floors, same floored
  * integer centroid mean (the `emb_outliers` spelling), same a²/b²
  * decomposition and integer means.
  */
object SilhouetteSql {

  val cohesionEmbeddingsSql: String =
    """WITH sv AS (
      |  SELECT vec_id, label,
      |    generate_subscripts(embedding, 1) - 1 AS pos,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS v
      |  FROM embeddings),
      |cents AS (
      |  SELECT label AS clabel, pos,
      |    CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS c
      |  FROM sv GROUP BY 1, 2),
      |d AS (
      |  SELECT sv.vec_id, sv.label, c.clabel,
      |    CAST(sum((v - c) * (v - c)) AS BIGINT) AS d2
      |  FROM sv JOIN cents c USING (pos)
      |  GROUP BY 1, 2, 3),
      |pv AS (
      |  SELECT vec_id, label,
      |    max(CASE WHEN clabel = label THEN d2 END) AS a2,
      |    min(CASE WHEN clabel <> label THEN d2 END) AS b2
      |  FROM d GROUP BY 1, 2)
      |SELECT label, count(*) AS n_vecs,
      |  CAST(sum(a2) AS BIGINT) // count(*) AS mean_own_d2,
      |  CAST(sum(b2) AS BIGINT) // count(*) AS mean_other_d2,
      |  CAST(sum(CASE WHEN b2 < a2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_closer_other
      |FROM pv
      |GROUP BY label
      |ORDER BY label""".stripMargin
}
