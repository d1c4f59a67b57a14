package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot diff between two corpus crawls — the CDC feed of an
  * incremental recrawl pipeline: which documents were added, removed, or
  * changed since the last snapshot, so downstream stages (dedup, quality,
  * tokenization) re-run only on the delta instead of the full 100 TB.
  * The same diff-only discipline as the MQTT history pipeline's change
  * predicate (F4), applied corpus-to-corpus instead of row-to-row.
  *
  * Scale shape: each side collapses to (doc_id, content_hash) BELOW the
  * join — the full-outer join shuffles 40-byte hash rows, never document
  * text (the projection prunes `text` right after the hash; ReadSchema
  * still carries it only to the md5). One co-partitioned SMJ on doc_id;
  * with both snapshots bucketed by doc_id on disk ([[graft.sources
  * .StorageLayout]]) the exchanges vanish entirely — the layout a
  * recurring recrawl would maintain. Status derivation is a pure
  * projection over presence flags and a null-safe hash compare.
  */
object CorpusDiff {

  /** Deterministic "previous snapshot" carved from the same corpus so the
    * certification exercises every status branch: docs with
    * `doc_id % AddedMod == 0` are missing from OLD (status `added`), docs
    * with `doc_id % RemovedMod == 1` are missing from NEW (`removed`), and
    * OLD carries a stale-suffix text for `doc_id % ChangedMod == 0`
    * (`changed`). Everything else: `unchanged`.
    */
  val AddedMod = 17L
  val RemovedMod = 23L
  val ChangedMod = 13L

  private[graft] def oldSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % AddedMod =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % ChangedMod === 0, concat(col("text"), lit(" [stale]")))
          .otherwise(col("text")).as("text"))

  private[graft] def newSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % RemovedMod =!= 1)
      .select(col("doc_id"), col("text"))

  /** (doc_id, status) for the union of both snapshots' doc_ids. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_hash"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_hash"),
      lit(true).as("__in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("old_hash") <=> col("new_hash")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Driver query: the per-document delta between the carved snapshots. */
  def diffDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    diff(oldSnapshot(docs), newSnapshot(docs)).orderBy(col("doc_id"))
  }
}

/** DuckDB oracle for [[CorpusDiff]] — same carve moduli, same md5 compare. */
object CorpusDiffSql {
  import CorpusDiff._

  val diffDocumentsSql: String =
    s"""WITH old_snap AS (
       |  SELECT doc_id,
       |    md5(CASE WHEN doc_id % $ChangedMod = 0 THEN text || ' [stale]'
       |        ELSE text END) AS old_hash
       |  FROM documents WHERE doc_id % $AddedMod <> 0),
       |new_snap AS (
       |  SELECT doc_id, md5(text) AS new_hash
       |  FROM documents WHERE doc_id % $RemovedMod <> 1)
       |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN o.doc_id IS NULL THEN 'added'
       |       WHEN n.doc_id IS NULL THEN 'removed'
       |       WHEN o.old_hash IS DISTINCT FROM n.new_hash THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
       |ORDER BY doc_id""".stripMargin
}
