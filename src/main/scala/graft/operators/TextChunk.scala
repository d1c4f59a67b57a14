package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Overlapping token-window chunking — the retrieval/context-window prep
  * step: every document is cut into [[ChunkWindow]]-token chunks on a
  * [[Stride]]-token grid, adjacent chunks overlapping by Window−Stride
  * tokens so no phrase is ever split across a boundary without also
  * appearing whole in a neighbor. Output is (doc_id, chunk_id, n_tokens,
  * chunk_text) — the unit a RAG index or a fixed-context trainer consumes.
  *
  * Tail rule: a chunk past the first is kept only if it extends beyond the
  * previous chunk's coverage (`max pos ≥ chunk_id·Stride + overlap`) —
  * otherwise it would be a strict subset of its predecessor and a
  * retrieval index would store a pure duplicate.
  *
  * Scale shape: token positions come from ONE posexplode pass; chunk
  * membership is an `explode(sequence(c_lo, c_hi))` with replication
  * bounded by ⌈Window/Stride⌉ = 2 (never the array-lambda shingle — the
  * O(len²) trap), and reassembly is one doc×chunk-keyed map-side-combined
  * aggregation. Total work is O(corpus tokens × 2) with a single shuffle
  * on the (doc_id, chunk_id) grain.
  *
  * Exactness: strings and non-negative integer division only (`div` and
  * DuckDB `//` agree on non-negatives); the chunk-floor guard keeps every
  * divided quantity non-negative.
  */
object TextChunk {

  /** Tokens per chunk. */
  val ChunkWindow = 32

  /** Chunk start grid; overlap = ChunkWindow - Stride = 8 tokens. */
  val Stride = 24

  private val Overlap = ChunkWindow - Stride

  /** (doc_id, chunk_id, n_tokens, chunk_text) on the stride grid. */
  def chunk(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .filter(length(col("token")) > 0)
    val member = toks
      .withColumn("c_lo",
        when(col("pos") < Overlap, 0L)
          .otherwise(expr(s"(pos - $Overlap) div $Stride")))
      .withColumn("c_hi", expr(s"pos div $Stride"))
      .select(col("doc_id"), col("pos"), col("token"),
        explode(sequence(col("c_lo"), col("c_hi"))).as("chunk_id"))
    member.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"), max(col("pos")).as("__maxp"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("chunk_text"))
      .filter(col("chunk_id") === 0 ||
        col("__maxp") >= col("chunk_id") * Stride + Overlap)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))
  }

  /** Driver query: the chunked documents table. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(spark, dir)).orderBy(col("doc_id"), col("chunk_id"))
}

/** DuckDB oracle for [[TextChunk]] — same 0-based positions, same grid
  * arithmetic, same tail rule, same space-joined reassembly.
  */
object TextChunkSql {
  import TextChunk.{ChunkWindow, Stride}

  private val Overlap = ChunkWindow - Stride

  val chunkDocumentsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, pos, token FROM (
       |    SELECT doc_id,
       |      generate_subscripts(${TS.tokens("text")}, 1) - 1 AS pos,
       |      unnest(${TS.tokens("text")}) AS token
       |    FROM documents)
       |  WHERE token <> ''),
       |member AS (
       |  SELECT doc_id, pos, token,
       |    unnest(range(
       |      CASE WHEN pos < $Overlap THEN 0 ELSE (pos - $Overlap) // $Stride END,
       |      pos // $Stride + 1)) AS chunk_id
       |  FROM toks)
       |SELECT doc_id, chunk_id,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  string_agg(token, ' ' ORDER BY pos) AS chunk_text
       |FROM member
       |GROUP BY 1, 2
       |HAVING chunk_id = 0 OR max(pos) >= chunk_id * $Stride + $Overlap
       |ORDER BY doc_id, chunk_id""".stripMargin
}
