package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextSql => TS}
import graft.sources.Tables

/** Cross-source content overlap — the dedup-planning diagnosis run before
  * mixing corpora: for every pair of sources, how many distinct word
  * [[Dedup.ShingleN]]-gram shingles they share, and the Jaccard similarity
  * of their shingle universes (in ppm). "How much of source A is already
  * inside source B" decides whether a cross-source dedup pass is worth its
  * shuffle — and which mixing weights double-count content.
  *
  * The shingle stage IS [[Dedup.hashedShingleSets]] verbatim (one spelling
  * of shingle extraction across the n-gram family, carrying `source`
  * through the native one-pass hasher).
  *
  * Scale shape: the per-source DISTINCT collapses each shingle to ≤
  * |sources| rows BEFORE any pairing, so the self-join explodes to at most
  * C(|sources|, 2) rows per distinct shingle — bounded by the source
  * domain, never by document frequency (the reason ngram_jaccard needs a
  * df-cap and this does not). Per-source universe sizes are a
  * |sources|-row aggregate of the same table, broadcast back twice.
  *
  * Exactness: integer shingle counts and ppm integer division (`div`/`//`,
  * non-negative); the 60-bit hash domain matches the string-keyed oracle
  * modulo md5 collisions (the certified ngram_jaccard trade).
  */
object SourceOverlap {

  /** (source_a, source_b, n_shared, n_a, n_b, jaccard_ppm) for every
    * source pair sharing at least one shingle.
    */
  def overlap(docs: DataFrame, n: Int = Dedup.ShingleN): DataFrame = {
    val ss = Caching.cached(
      Dedup.hashedShingleSets(docs, n, extra = Seq("source"))
        .select(col("source"), explode(col("sh")).as("s"))
        .distinct())
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val pairs = ss.as("a")
      .join(ss.as("b"), col("a.s") === col("b.s") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.as("sa")), col("source_a") === col("sa.source"))
      .join(broadcast(sizes.as("sb")), col("source_b") === col("sb.source"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("sa.sz").as("n_a"), col("sb.sz").as("n_b"),
        expr("n_shared * 1000000 div (sa.sz + sb.sz - n_shared)")
          .as("jaccard_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Driver query: the source-pair overlap report of the documents table. */
  def overlapDocuments(spark: SparkSession, dir: String): DataFrame =
    overlap(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[SourceOverlap]] — string-keyed shingles (the
  * ngram_jaccard oracle convention), same distinct-then-pair shape, same
  * ppm integer division.
  */
object SourceOverlapSql {

  def overlapDocumentsSql(n: Int = Dedup.ShingleN): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, ${TS.tokens("text")} AS __t FROM documents
       |  WHERE ${TS.nTokens("text")} >= $n),
       |ss AS (
       |  SELECT DISTINCT source, unnest(list_distinct(${TS.shingles("text", n)})) AS s
       |  FROM toks),
       |sizes AS (SELECT source, count(*) AS sz FROM ss GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, n_shared,
       |       sa.sz AS n_a, sb.sz AS n_b,
       |       n_shared * 1000000 // (sa.sz + sb.sz - n_shared) AS jaccard_ppm
       |FROM pairs
       |JOIN sizes sa ON source_a = sa.source
       |JOIN sizes sb ON source_b = sb.source
       |ORDER BY source_a, source_b""".stripMargin
}
