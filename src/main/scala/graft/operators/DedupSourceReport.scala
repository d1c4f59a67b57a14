package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-source exact-duplication rate — which feeds are copying each
  * other (or themselves): for every source, its document count, distinct
  * content count (the [[Dedup.contentHash]] spelling, shared with
  * `dedup_exact` so the rates can never disagree with the dedup pass
  * they predict), within-source duplicate rate, and how many of its
  * distinct contents also appear in OTHER sources — the
  * syndication/mirror signal that decides crawl priorities.
  *
  * Scale shape: ONE corpus-sized map-side-combined shuffle to the
  * (source, hash) table; the cross-source flag is a second aggregation
  * of THAT table to the hash domain joined back on hash (hash-join,
  * both sides already hash-shaped); the report folds to |sources| rows.
  *
  * Exactness: counts and non-negative ppm `div` only.
  */
object DedupSourceReport {

  /** (source, n_docs, n_unique, dup_ppm, n_shared): within-source dup
    * rate in ppm of docs; `n_shared` = distinct contents this source
    * shares with at least one other source.
    */
  def report(docs: DataFrame): DataFrame = {
    val byHash = Caching.cached(docs
      .select(col("source"), Dedup.contentHash(col("text")).as("h"))
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("n")))
    val spread = byHash.groupBy(col("h"))
      .agg(count(lit(1)).as("n_sources"))
    byHash.join(spread, Seq("h"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_unique"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        expr("((n_docs - n_unique) * 1000000) div n_docs").as("dup_ppm"),
        col("n_shared"))
      .orderBy(col("source"))
  }

  /** Driver query: the duplication report of the documents corpus. */
  def reportDocuments(spark: SparkSession, dir: String): DataFrame =
    report(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[DedupSourceReport]] — the shared content-hash
  * spelling, same two-level fold.
  */
object DedupSourceReportSql {

  val reportDocumentsSql: String =
    """WITH byhash AS (
      |  SELECT source, md5(trim(text)) AS h, count(*) AS n
      |  FROM documents GROUP BY 1, 2),
      |spread AS (SELECT h, count(*) AS n_sources FROM byhash GROUP BY 1)
      |SELECT b.source, CAST(sum(b.n) AS BIGINT) AS n_docs,
      |  count(*) AS n_unique,
      |  ((CAST(sum(b.n) AS BIGINT) - count(*)) * 1000000)
      |    // CAST(sum(b.n) AS BIGINT) AS dup_ppm,
      |  CAST(sum(CASE WHEN s.n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_shared
      |FROM byhash b JOIN spread s USING (h)
      |GROUP BY b.source
      |ORDER BY source""".stripMargin
}
