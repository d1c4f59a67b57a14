package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS, WinnowFingerprints}
import graft.sources.Tables

/** Winnowing fingerprints over the documents table — the position-robust
  * rolling-hash document fingerprint ([[graft.functions.WinnowFingerprints]]
  * for the algorithm and guarantee). Complements the content-hash /
  * token-set fingerprints (`text_fingerprints`): those detect whole-doc
  * duplication; winnowing detects SHARED PASSAGES of >= w + n - 1 words at
  * ~2/(w+1) the index size of the full shingle set.
  *
  * Scale shape: entirely narrow — one pass per document inside the scan
  * stage, no shuffle, no state; the fingerprint set is the column a
  * passage-overlap index would explode + groupBy, exactly like
  * `dedup_passage` does with its aligned chunks.
  */
object Winnow {

  val ShingleK = 3 // word n-gram size (the Dedup family's ShingleN)
  val WindowW = 4  // winnowing window: guarantee threshold = w + k - 1 = 6 words

  def fingerprints(docs: DataFrame): DataFrame = {
    val fps = WinnowFingerprints(col("text"), ShingleK, WindowW)
    docs.select(
      col("doc_id"),
      greatest(TF.nTokens(col("text")) - (ShingleK - 1), lit(0)).cast("long").as("n_grams"),
      size(fps).as("n_fps"),
      md5(array_join(transform(fps, _.cast("string")), ",").cast("binary")).as("winnow_hash"))
  }

  /** Driver query: per-doc winnowing fingerprint summary. */
  def winnowDocs(spark: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Shared-passage detection over the winnow fingerprint index: documents
    * sharing a fingerprint shared a passage (with the winnowing guarantee,
    * ANY >= w+k-1-word overlap surfaces — including unaligned ones, which
    * `dedup_passage`'s fixed chunk grid misses by construction).
    *
    * Same scale shape as [[Dedup.passageDups]]: explode is narrow and
    * pipelined with the scan, the single shuffle keys on the 8-byte
    * fingerprint with map-side combine, and the >= 2 filter is a HAVING
    * after aggregation — candidate pairs are never materialized.
    */
  def sharedPassages(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(WinnowFingerprints(col("text"), ShingleK, WindowW)).as("fp"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** Driver query: winnow-fingerprint passage collisions. */
  def winnowDups(spark: SparkSession, dir: String): DataFrame =
    sharedPassages(Tables.documents(spark, dir)).orderBy(col("fp"))

  /** One tokenize→shingle-hash→fingerprint chain under a CTE-name prefix
    * over source relation `src`, ending in `${p}f(doc_id, fps)` — ONE
    * spelling shared by the pair/distinct oracles here and the delta
    * screen oracle ([[DedupDeltaSql]]), so the fingerprint spelling cannot
    * drift.
    */
  private[operators] def winnowFpChainSql(p: String, src: String): String = {
    val k = ShingleK
    val w = WindowW
    s"""${p}toks AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM $src),
       |${p}h AS (
       |  SELECT doc_id,
       |    list_transform(${TS.shingles("text", k)}, s -> ${TS.hash60("s")}) AS hh
       |  FROM ${p}toks),
       |${p}f AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hh) = 0 THEN CAST([] AS BIGINT[])
       |         WHEN len(hh) < $w THEN [list_min(hh)]
       |         ELSE list_sort(list_distinct(list_transform(
       |                range(len(hh) - ${w - 1}), i -> list_min(hh[i+1:i+$w]))))
       |    END AS fps
       |  FROM ${p}h)""".stripMargin
  }

  val winnowDupsSql: String =
    s"""WITH ${winnowFpChainSql("", "documents")},
       |x AS (SELECT doc_id, unnest(fps) AS fp FROM f)
       |SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  min(doc_id) AS first_doc
       |FROM x GROUP BY fp
       |HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY fp""".stripMargin

  /** Oracle for the streaming twin's certified surface: the corpus's
    * DISTINCT winnow fingerprint set.
    */
  val distinctFpsSql: String =
    s"""WITH ${winnowFpChainSql("", "documents")}
       |SELECT DISTINCT unnest(fps) AS fp FROM f ORDER BY fp""".stripMargin

  val winnowDocsSql: String = {
    val k = ShingleK
    val w = WindowW
    s"""WITH toks AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents),
       |h AS (
       |  SELECT doc_id, len(__t) AS n_toks,
       |    list_transform(${TS.shingles("text", k)}, s -> ${TS.hash60("s")}) AS hh
       |  FROM toks),
       |f AS (
       |  SELECT doc_id,
       |    CAST(greatest(n_toks - ${k - 1}, 0) AS BIGINT) AS n_grams,
       |    CASE WHEN len(hh) = 0 THEN CAST([] AS BIGINT[])
       |         WHEN len(hh) < $w THEN [list_min(hh)]
       |         ELSE list_sort(list_distinct(list_transform(
       |                range(len(hh) - ${w - 1}), i -> list_min(hh[i+1:i+$w]))))
       |    END AS fps
       |  FROM h)
       |SELECT doc_id, n_grams, CAST(len(fps) AS INT) AS n_fps,
       |  md5(array_to_string(fps, ',')) AS winnow_hash
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
