package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Chunk-level exact dedup — the retrieval-index prep step after
  * [[TextChunk]]: identical chunk texts (the overlap windows of duplicated
  * or templated passages) collapse to one canonical copy, and each
  * document reports how much of its chunk set survived. A RAG index built
  * from `n_kept` stores each passage once; `n_dup` is the redundancy the
  * dedup removed.
  *
  * The chunking stage IS [[TextChunk.chunk]] verbatim (the composite
  * discipline: no respelled expressions), so this report can never
  * disagree with the certified chunk operator about what the chunks are.
  *
  * Scale shape: the canonical-copy choice is a `row_number` window
  * partitioned by the chunk CONTENT HASH — high-cardinality, each
  * partition holding only the copies of one distinct chunk — under the
  * (doc_id, chunk_id) total order; the per-doc rollup is one map-side-
  * combined aggregation. Hash rows only ever shuffle with their
  * (doc_id, chunk_id) coordinates — never the chunk text itself.
  *
  * Exactness: md5 content hash (the [[Dedup.exact]] convention), integer
  * counts, same window total order both engines.
  */
object ChunkDedup {

  /** (doc_id, n_chunks, n_kept, n_dup) per chunk-bearing document. */
  def dedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("__h"))
      .orderBy(col("doc_id"), col("chunk_id"))
    TextChunk.chunk(docs)
      .select(col("doc_id"), col("chunk_id"), md5(col("chunk_text")).as("__h"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup"))
  }

  /** Driver query: the per-document chunk-dedup report. */
  def dedupDocuments(spark: SparkSession, dir: String): DataFrame =
    dedup(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[ChunkDedup]] — the certified chunk SQL embedded
  * verbatim, then the same hash-partitioned canonical choice.
  */
object ChunkDedupSql {

  val dedupDocumentsSql: String =
    s"""WITH ch AS (SELECT * FROM (${TextChunkSql.chunkDocumentsSql})),
       |flagged AS (
       |  SELECT doc_id,
       |    row_number() OVER (PARTITION BY md5(chunk_text)
       |      ORDER BY doc_id, chunk_id) AS rn
       |  FROM ch)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |FROM flagged
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
