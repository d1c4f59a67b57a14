package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** In-degree distribution of the approximate kNN graph — the hubness
  * instrument for the ANN family: how often each vector is chosen as
  * someone's neighbor. A heavy right tail (hub vectors absorbing edges)
  * predicts degraded recall and biased dedup clustering in high
  * dimensions; isolated vectors (in-degree 0 — never any bucket-mate's
  * top-k, or bucketless under the LSH) measure candidate-coverage holes.
  * Together with `emb_distance_histogram` this quantifies the
  * distance-concentration finding the PQ-recall work recorded.
  *
  * The edge stage IS [[KnnGraph.graph]] verbatim (the composite
  * discipline — one spelling; its LSH candidate generation and rank
  * window are certified by `ann_knn_graph`). The degree tail adds one
  * vocabulary-sized count on nbr_id, a left join from the vector-id
  * projection to pick up the zeros, and a histogram-sized final
  * aggregate.
  *
  * Exactness: pure integer counts end to end; total order by in_degree.
  */
object GraphDegree {

  /** (in_degree, n_vecs): how many vectors are chosen as a neighbor
    * exactly in_degree times (0 included), ordered by in_degree.
    */
  def histogram(emb: DataFrame): DataFrame = {
    val indeg = KnnGraph.graph(emb)
      .groupBy(col("nbr_id").as("vec_id"))
      .agg(count(lit(1)).as("d"))
    emb.select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .select(coalesce(col("d"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("in_degree"))
  }

  /** Driver query: the in-degree histogram of the embeddings kNN graph. */
  def histogramEmbeddings(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[GraphDegree]] — the certified kNN-graph SQL as the
  * edge stage, same zero-inclusive left join, same histogram.
  */
object GraphDegreeSql {

  val histogramEmbeddingsSql: String =
    s"""WITH g AS (${KnnGraphSql.graphEmbeddingsSql()}),
       |indeg AS (
       |  SELECT nbr_id AS vec_id, count(*) AS d FROM g GROUP BY 1)
       |SELECT coalesce(d, 0) AS in_degree, count(*) AS n_vecs
       |FROM embeddings e LEFT JOIN indeg USING (vec_id)
       |GROUP BY 1
       |ORDER BY in_degree""".stripMargin
}
