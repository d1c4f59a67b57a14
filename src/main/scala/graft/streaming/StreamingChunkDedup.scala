package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextChunk
import graft.sources.Tables

/** Streaming twin of [[graft.operators.ChunkDedup]]'s canonical-assignment
  * stage: as documents arrive, every chunk's content hash resolves to its
  * canonical copy — the minimum (doc_id, chunk_id) coordinate seen so far
  * — so a RAG/retrieval index ingesting the stream always knows which
  * physical chunk stores each distinct passage. This certifies the
  * assignment itself incrementally (a stronger surface than the exact-
  * dedup twin's key set: the canonical COORDINATES are part of the hash);
  * the per-document rollup report remains the batch operator's surface
  * (it needs a second stateful aggregation over the same arrivals, which
  * a single update-mode query cannot host).
  *
  * Chunking cannot host the batch form's per-(doc, chunk) aggregation
  * inside the stream (it would be a second stateful operator), so chunks
  * are respelled PER ROW over the token array — `slice` windows on the
  * same stride grid with the same subset-tail rule — and the spelling is
  * pinned chunk-for-chunk against [[TextChunk.chunk]] in
  * StreamingChunkDedupSpec (the StreamingCollocations discipline: a
  * respelling is acceptable only when spec-pinned equal AND certified
  * against the same oracle).
  *
  * State: one (doc_id, chunk_id) pair per DISTINCT chunk hash — the
  * operator's own output domain, never chunk bodies. The running min is
  * monotone nonincreasing, so the final canonical pair is the row-min of
  * the update-mode emissions, batch-order-independent (the corpus-drift
  * max-fold discipline, with min as the monotone direction).
  */
object StreamingChunkDedup {

  import TextChunk.{ChunkWindow, Stride}

  private val Overlap = ChunkWindow - Stride

  /** The per-row chunk respelling: (doc_id, chunk_id, chunk_text) from the
    * token array alone — no window, no aggregation. Replication is the
    * same `ceil(W/S) = 2` bound as the batch membership explode.
    */
  private[streaming] def chunkRows(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    docs
      .withColumn("__toks",
        filter(TF.tokens(col("text")), t => length(t) > 0))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), explode(filter(
        transform(sequence(lit(0L), expr(s"(__n - 1) div $Stride")),
          i => struct(i.as("chunk_id"),
            array_join(slice(col("__toks"),
              (i * Stride + 1).cast("int"), lit(ChunkWindow)), " ").as("chunk_text"))),
        s => s.getField("chunk_id") === 0L ||
          s.getField("chunk_id") * Stride + Overlap <= col("__n") - 1))
        .as("ch"))
      .select(col("doc_id"), col("ch.chunk_id").as("chunk_id"),
        col("ch.chunk_text").as("chunk_text"))
  }

  /** Driver query: the canonical (hash → min (doc_id, chunk_id))
    * assignment with the corpus consumed as `chunks` real file-source
    * micro-batches; SAME canonical rule as the batch window's rn = 1 row.
    */
  def canonicalFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val staged = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "chunkdedup_file", outputMode = "update",
      col("doc_id")) { stream =>
      chunkRows(stream)
        .select(md5(col("chunk_text")).as("chunk_hash"),
          struct(col("doc_id"), col("chunk_id")).as("c"))
        .groupBy(col("chunk_hash"))
        .agg(min(col("c")).as("c"))
    }
    emissions.groupBy(col("chunk_hash"))
      .agg(min(col("c")).as("c"))
      .select(col("chunk_hash"), col("c.doc_id").as("doc_id"),
        col("c.chunk_id").as("chunk_id"))
      .orderBy(col("chunk_hash"))
  }
}

/** DuckDB oracle for [[StreamingChunkDedup]] — the certified chunk SQL as
  * the chunk stage, the batch canonical window's rn = 1 rows.
  */
object StreamingChunkDedupSql {

  val canonicalDocumentsSql: String =
    s"""WITH ch AS (SELECT * FROM (${graft.operators.TextChunkSql.chunkDocumentsSql})),
       |flagged AS (
       |  SELECT md5(chunk_text) AS chunk_hash, doc_id, chunk_id,
       |    row_number() OVER (PARTITION BY md5(chunk_text)
       |      ORDER BY doc_id, chunk_id) AS rn
       |  FROM ch)
       |SELECT chunk_hash, doc_id, chunk_id
       |FROM flagged WHERE rn = 1
       |ORDER BY chunk_hash""".stripMargin
}
