package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** k-NN majority-vote classification over the embedding table — the
  * standard embedding-quality probe (kNN accuracy on held-out labels is
  * how embedding spaces are evaluated before anything is trained on
  * them). For each query vector: the [[K]] exact-cosine nearest
  * neighbors (self excluded) vote with their labels; the prediction is
  * the modal label, ties broken toward the smallest label.
  *
  * Reuses [[Similarity.bruteForceTopK]] VERBATIM as the neighbor stage —
  * one spelling of the ranking contract, so classification can never
  * disagree with the certified top-k operator about who the neighbors
  * are. The ANN variants drop in by swapping that one call (the re-rank
  * lesson: candidates change, the vote tail does not).
  *
  * Scale shape: the vote tail touches only queries×K rows — the top-k
  * result broadcasts into the label fetch, votes collapse map-side to at
  * most queries×|labels| rows, and the argmax window partitions by query
  * (high-cardinality key, ≤|labels| rows each).
  *
  * Exactness: the neighbor SET is the certified top-k contract
  * (ties on vec_id); votes are integers; the prediction is an integer
  * argmax under the (votes DESC, label ASC) total order.
  */
object KnnClassify {

  /** Query vectors classified (vec_id < QueryMax — the ANN convention). */
  val QueryMax = 32L

  /** Neighbors consulted per query. */
  val K = 10

  /** (query_id, true_label, pred_label, votes, hit). */
  def classify(emb: DataFrame, queryMaxId: Long = QueryMax, k: Int = K): DataFrame = {
    val topk = Similarity.bruteForceTopK(emb, queryMaxId, k)
      .select(col("query_id"), col("vec_id"))
    val votes = emb.select(col("vec_id"), col("label"))
      .join(broadcast(topk), Seq("vec_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
    emb.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"))
      .join(pred, Seq("query_id"))
      .select(col("query_id"), col("true_label"), col("pred_label"), col("votes"),
        when(col("true_label") === col("pred_label"), 1L).otherwise(0L).as("hit"))
  }

  /** Driver query: kNN label predictions for the query slice. */
  def classifyEmbeddings(spark: SparkSession, dir: String): DataFrame =
    classify(Tables.embeddings(spark, dir)).orderBy(col("query_id"))
}

/** DuckDB oracle for [[KnnClassify]] — the certified brute-force top-k SQL
  * embedded verbatim as the neighbor stage, then the same integer vote.
  */
object KnnClassifySql {
  import KnnClassify._

  val classifyEmbeddingsSql: String =
    s"""WITH topk AS (
       |  SELECT query_id, vec_id
       |  FROM (${SimilaritySql.bruteForceTopKSql(QueryMax, K)})),
       |votes AS (
       |  SELECT t.query_id, e.label, CAST(count(*) AS BIGINT) AS votes
       |  FROM topk t JOIN embeddings e USING (vec_id)
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT query_id, label AS pred_label, votes FROM (
       |    SELECT query_id, label, votes,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY votes DESC, label) AS rn
       |    FROM votes)
       |  WHERE rn = 1)
       |SELECT q.vec_id AS query_id, q.label AS true_label,
       |  p.pred_label, p.votes,
       |  CAST(CASE WHEN q.label = p.pred_label THEN 1 ELSE 0 END AS BIGINT)
       |    AS hit
       |FROM embeddings q JOIN pred p ON q.vec_id = p.query_id
       |WHERE q.vec_id < $QueryMax
       |ORDER BY query_id""".stripMargin
}
