package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusDiff
import graft.sources.Tables

/** Streaming twin of [[CorpusDiff.diffDocuments]] — the composition an
  * incremental recrawl actually runs: the NEW crawl arrives as files and
  * streams against the STATIC previous snapshot (a stateless stream-static
  * left join classifies added/changed/unchanged per micro-batch, no
  * watermark, no state), and deletions fall out of one batch anti-join
  * afterwards (a doc the stream never saw was removed). SAME oracle as
  * the batch diff.
  *
  * Scale: the per-batch work is a hash projection plus a doc-keyed join
  * against the previous snapshot's (doc_id, hash) table — at deployment
  * scale that side is the bucketed-by-doc_id layout
  * ([[graft.sources.StorageLayout]]), so each micro-batch joins
  * exchange-free. Emission volume equals new-snapshot cardinality (each
  * staged doc classified exactly once — append mode over disjoint files),
  * and the deletion pass is one co-partitioned anti-join on hash rows.
  */
object StreamingCorpusDiff {

  def diffDocumentsFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = CorpusDiff.oldSnapshot(docs)
      .select(col("doc_id"), md5(col("text")).as("old_hash"),
        lit(true).as("__in_old"))
    val staged = CorpusDiff.newSnapshot(docs)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4, prefix = "cdiff_file",
      outputMode = "append", col("doc_id"))(
      stream => stream
        .select(col("doc_id"), md5(col("text")).as("new_hash"))
        .join(old, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__in_old").isNull, "added")
            .when(!(col("old_hash") <=> col("new_hash")), "changed")
            .otherwise("unchanged").as("status")))
    val removed = old
      .join(emissions.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("removed").as("status"))
    emissions.unionAll(removed).orderBy(col("doc_id"))
  }
}
