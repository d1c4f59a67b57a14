package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** LSH bucket-balance report — the table-health counterpart of
  * [[IvfBalance]] for the random-hyperplane index behind `ann_lsh` and
  * the near-dup candidate stages: per hash table, how many of its 2^P
  * buckets are occupied and how lopsided the occupancy is. A table whose
  * largest bucket holds half the corpus contributes quadratic candidate
  * pairs (the MaxBucket cap then drops them — this report is what
  * predicts those drops BEFORE they are observed).
  *
  * Scale shape: the bucket rows are [[Similarity.lshBuckets]] VERBATIM
  * (the search's own stage); one map-side-combined fold to occupied
  * buckets, a second to |tables| rows. Exactness: counts and
  * non-negative `div` only.
  */
object LshBalance {

  /** (tbl, n_buckets, n_rows, max_bucket, mean_bucket) per hash table. */
  def report(emb: DataFrame): DataFrame = {
    val sizes = Similarity.lshBuckets(emb)
      .groupBy(col("bk")).agg(count(lit(1)).as("n"))
    sizes
      .select(expr("bk div 4294967296").as("tbl"), col("n"))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_bucket"))
      .select(col("tbl"), col("n_buckets"), col("n_rows"), col("max_bucket"),
        expr("n_rows div n_buckets").as("mean_bucket"))
      .orderBy(col("tbl"))
  }

  /** Driver query: the bucket balance of the embeddings LSH tables. */
  def reportEmbeddings(spark: SparkSession, dir: String): DataFrame =
    report(Tables.embeddings(spark, dir))
}

/** DuckDB oracle for [[LshBalance]] — the shared bucket-list spelling
  * ([[SimilaritySql.lshBucketListSql]]), same folds.
  */
object LshBalanceSql {

  val reportEmbeddingsSql: String =
    s"""WITH b AS (
       |  SELECT vec_id, unnest(${SimilaritySql.lshBucketListSql()}) AS bk
       |  FROM embeddings),
       |s AS (SELECT bk, count(*) AS n FROM b GROUP BY 1)
       |SELECT bk // 4294967296 AS tbl, count(*) AS n_buckets,
       |  CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_bucket,
       |  CAST(sum(n) AS BIGINT) // count(*) AS mean_bucket
       |FROM s GROUP BY 1 ORDER BY tbl""".stripMargin
}
