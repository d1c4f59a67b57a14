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

  /** The recrawl step AFTER the diff: dedup the delta against the ENTIRE
    * previous snapshot's content, not just the same doc_id — a newly
    * crawled or changed page routinely duplicates a DIFFERENT existing
    * page (mirrors, moved URLs), and only content novel to the whole old
    * corpus should re-enter the pipeline. `is_novel = false` marks delta
    * docs whose content hash exists anywhere in the old snapshot.
    *
    * Scale shape: the old side collapses to a DISTINCT hash set (40-byte
    * rows) before the left-anti-style membership join; the delta side is
    * diff-classified rows only. One hash-keyed join, no text anywhere
    * past the md5 projections.
    */
  def deltaDedup(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val statuses = diff(oldDocs, newDocs)
      .filter(col("status").isin("added", "changed"))
    val newHashes = newDocs.select(col("doc_id"), md5(col("text")).as("h"))
    val oldHashes = oldDocs.select(md5(col("text")).as("h"))
      .distinct().withColumn("__seen", lit(true))
    statuses.join(newHashes, Seq("doc_id"))
      .join(oldHashes, Seq("h"), "left")
      .select(col("doc_id"), col("status"),
        col("__seen").isNull.as("is_novel"))
  }

  /** Driver query: the delta-dedup verdicts over the carved snapshots.
    * The corpus's texts are unique, so the carve alone never produces a
    * cross-doc duplicate and `is_novel = false` would be vacuous; MIRROR
    * docs (new ids carrying the text of a doc that sits unchanged in the
    * old snapshot — the moved-URL/mirror-site case this operator exists
    * for) are unioned into the new crawl, the [[Dedup.probeAugmented]]
    * discipline.
    */
  val MirrorMod = 29L

  def deltaDedupDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // mirror ids NEGATED: real doc_ids are non-negative (and the mirror
    // carve excludes 0), so -doc_id is disjoint from the live id space at
    // ANY corpus size — a fixed offset would collide once the corpus
    // outgrew it
    val mirrors = docs.filter(col("doc_id") % MirrorMod === 2 &&
        col("doc_id") % AddedMod =!= 0 && col("doc_id") % ChangedMod =!= 0)
      .select((-col("doc_id")).as("doc_id"), col("text"))
    deltaDedup(oldSnapshot(docs), newSnapshot(docs).unionAll(mirrors))
      .orderBy(col("doc_id"))
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

  /** Mirror of [[CorpusDiff.deltaDedup]] over the same carve. */
  val deltaDedupDocumentsSql: String =
    s"""WITH old_snap AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $ChangedMod = 0 THEN text || ' [stale]'
       |        ELSE text END AS text
       |  FROM documents WHERE doc_id % $AddedMod <> 0),
       |new_snap AS (
       |  SELECT doc_id, text
       |  FROM documents WHERE doc_id % $RemovedMod <> 1
       |  UNION ALL
       |  SELECT -doc_id, text FROM documents
       |  WHERE doc_id % ${CorpusDiff.MirrorMod} = 2
       |    AND doc_id % $AddedMod <> 0 AND doc_id % $ChangedMod <> 0),
       |statuses AS (
       |  SELECT n.doc_id, CASE WHEN o.doc_id IS NULL THEN 'added'
       |    WHEN md5(o.text) IS DISTINCT FROM md5(n.text) THEN 'changed'
       |    END AS status, md5(n.text) AS h
       |  FROM new_snap n LEFT JOIN old_snap o ON o.doc_id = n.doc_id),
       |delta AS (SELECT doc_id, status, h FROM statuses
       |          WHERE status IS NOT NULL),
       |old_hashes AS (SELECT DISTINCT md5(text) AS h FROM old_snap)
       |SELECT d.doc_id, d.status, (oh.h IS NULL) AS is_novel
       |FROM delta d LEFT JOIN old_hashes oh ON d.h = oh.h
       |ORDER BY d.doc_id""".stripMargin
}
