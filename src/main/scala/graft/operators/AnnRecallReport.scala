package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The ANN serve-quality dashboard as a certified QUERY: per index
  * family, how much of the exact cosine top-k the family's top-k
  * recovers (recall as exact ppm) — the number a serving team reads
  * before routing traffic to an index, produced by the same engine that
  * built the index instead of an offline eval script that can drift.
  *
  * Every family's candidate/rank stage is the certified operator
  * VERBATIM ([[Similarity.lshTopK]] / [[Similarity.lshRerankTopK]] /
  * [[Similarity.ivfTopK]] / [[Similarity.ivfRerankTopK]] /
  * [[ProductQuantization.ivfPqResRerankTopK]]) — the r16 discipline that
  * an instrument must reuse the stages it prices. The suite-level floors
  * (AnnRecallSf01Spec) pin thresholds; this query materializes the
  * measurement itself under the oracle gate.
  *
  * Scale shape: the exact baseline is ONE brute-force pass (cached — it
  * anchors every family's semi-join); each family contributes nq x k
  * rows, so everything after the index scans is dashboard-sized. The
  * semi-join against the exact pair set is a broadcast of nq x k pairs.
  *
  * Exactness: hits are integer pair-set intersections; recall_ppm is a
  * non-negative integer `div`.
  */
object AnnRecallReport {

  /** (family, hits, n_exact, recall_ppm), ordered by family. */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val exact = Caching.cached(Similarity.bruteForceTopK(emb)
      .select(col("query_id"), col("vec_id")))
    val families: Seq[(String, DataFrame)] = Seq(
      "ivf" -> Similarity.ivfTopK(emb),
      "ivf_rerank" -> Similarity.ivfRerankTopK(emb),
      "lsh" -> Similarity.lshTopK(emb),
      "lsh_rerank" -> Similarity.lshRerankTopK(emb),
      "pq_rerank" -> ProductQuantization.ivfPqResRerankTopK(emb))
    val pairs = families.map { case (f, df) =>
      df.select(lit(f).as("family"), col("query_id"), col("vec_id"))
    }.reduce(_.unionAll(_))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    pairs
      .join(broadcast(exact), Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("family")).agg(count(lit(1)).as("hits"))
      .crossJoin(broadcast(nExact))
      .select(col("family"), col("hits"), col("n_exact"),
        expr("(hits * 1000000) div n_exact").as("recall_ppm"))
      .orderBy(col("family"))
  }
}

/** DuckDB oracle for [[AnnRecallReport]] — each family's certified SQL
  * embedded verbatim as a subquery, the same pair-set semi-join and ppm.
  */
object AnnRecallReportSql {

  val reportSql: String = {
    val families = Seq(
      "ivf" -> SimilaritySql.ivfTopKSql(),
      "ivf_rerank" -> SimilaritySql.ivfTopKSql(
        nProbe = Similarity.IvfRerankProbe),
      "lsh" -> SimilaritySql.lshTopKSql(),
      "lsh_rerank" -> SimilaritySql.lshRerankTopKSql(),
      "pq_rerank" -> ProductQuantizationSql.annIvfPqRerankSql())
    val union = families.map { case (f, sql) =>
      s"SELECT '$f' AS family, query_id, vec_id FROM ($sql) t_$f"
    }.mkString("\nUNION ALL\n")
    s"""WITH exact AS (
       |  SELECT query_id, vec_id
       |  FROM (${SimilaritySql.bruteForceTopKSql()}) t_exact),
       |fam AS (
       |$union),
       |hits AS (
       |  SELECT family, count(*) AS hits
       |  FROM fam
       |  WHERE EXISTS (SELECT 1 FROM exact e
       |                WHERE e.query_id = fam.query_id
       |                  AND e.vec_id = fam.vec_id)
       |  GROUP BY family),
       |n AS (SELECT count(*) AS n_exact FROM exact)
       |SELECT family, hits, n_exact,
       |  (hits * 1000000) // n_exact AS recall_ppm
       |FROM hits CROSS JOIN n
       |ORDER BY family""".stripMargin
  }
}
