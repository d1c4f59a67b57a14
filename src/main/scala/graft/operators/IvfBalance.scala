package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** IVF cell-balance report — the inverted-list health check behind every
  * `ann_ivf*` latency claim: per trained coarse cell, its member count
  * and corpus share. A cell holding 30% of the corpus makes every probe
  * touching it a 30%-scan — this report is what tells the operator to
  * retrain or split before that happens.
  *
  * Scale shape: the codebook and the per-vector argmax are
  * [[Similarity.trainedCentroidsOf]] / [[Similarity.nearestCentroids]]
  * VERBATIM (the certified `ann_ivf_trained` assignment — the report
  * cannot disagree with the index it audits); the fold is one map-side
  * combined shuffle to |cells| rows; the share denominator is a window
  * over the |cells|-row result (never the data — the single-partition
  * window touches ≤ nCentroids rows).
  *
  * Exactness: counts and non-negative ppm `div`; shares floor, so they
  * sum to ≤ 1e6 with deficit < |cells|.
  */
object IvfBalance {

  /** (cid, n_vecs, share_ppm) per surviving trained cell, by cid. */
  def report(emb: DataFrame, nCentroids: Int = 16): DataFrame = {
    val withNorm = Similarity.withNormOf(emb)
    val assigned = Similarity.nearestCentroids(withNorm,
      Similarity.trainedCentroidsOf(emb, nCentroids),
      "vec_id", "embedding", "nrm", 1)
    val sizes = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
    sizes
      .withColumn("__total", sum(col("n_vecs")).over(Window.partitionBy()))
      .select(col("cid"), col("n_vecs"),
        expr("(n_vecs * 1000000) div __total").as("share_ppm"))
      .orderBy(col("cid"))
  }

  /** Driver query: the cell balance of the trained IVF codebook. */
  def reportEmbeddings(spark: SparkSession, dir: String): DataFrame =
    report(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[IvfBalance]] — the SHARED trained-assignment CTE
  * chain ([[SimilaritySql.trainedAssignCtes]]), same fold and shares.
  */
object IvfBalanceSql {

  val reportEmbeddingsSql: String =
    s"""WITH ${SimilaritySql.trainedAssignCtes()},
       |sizes AS (SELECT cid, count(*) AS n_vecs FROM assigned GROUP BY 1)
       |SELECT cid, n_vecs,
       |  (n_vecs * 1000000) //
       |    CAST(sum(n_vecs) OVER () AS BIGINT) AS share_ppm
       |FROM sizes ORDER BY cid""".stripMargin
}
