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
