package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Caching, CorpusDiff}
import graft.sources.Tables

/** Streaming twin of [[Bm25.bm25DeltaTopK]] — lexical-index maintenance on
  * ingest: the recrawl's delta documents arrive as file micro-batches
  * carrying their PARSE-STAGE posting rows (doc_id, term, tf, len — the
  * projection an ingest pipeline computes next to the tokenizer, the
  * minhash-delta staging discipline), accumulate as a monotone update-mode
  * aggregation (the per-(doc, term) index increments — exactly the state an
  * index-maintenance job holds, bounded by the DELTA index size, never the
  * corpus), and the readback folds them into the frozen old artifacts
  * through the ONE merge-and-serve spelling ([[Bm25.mergeServe]] verbatim).
  * SAME oracle as `text_bm25_delta` (= the full-rebuild spelling), so the
  * gate certifies ingest-time maintenance ≡ batch refresh ≡ rebuild.
  *
  * Monotonicity: each (doc_id, term) posting row arrives in exactly one
  * micro-batch (documents are not split across files), so the update-mode
  * max-fold readback ([[StreamingBudgetSample]]'s discipline) is
  * batch-order-independent by construction — the fold is an identity over
  * single-emission keys, kept as max so a re-emission under retry replays
  * harmlessly.
  *
  * Scale shape: the frozen index never reshuffles (the caches stand in for
  * the persisted term-bucketed artifacts); per-batch work is the arriving
  * rows' shuffle into the state store; the serve probe after the fold is
  * the batch delta form's query-sized plan.
  */
object StreamingBm25Delta {

  def bm25DeltaFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3, k: Int = Bm25.TopK): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldDocs = docs.filter(col("doc_id") % CorpusDiff.AddedMod =!= 0)
    val deltaDocs = docs.filter(col("doc_id") % CorpusDiff.AddedMod === 0)
    val tfOld = Caching.cached(Bm25.postings(oldDocs))

    // parse-stage staging: posting rows with the doc's length attached
    val deltaTf = Bm25.postings(deltaDocs)
    val staged = deltaTf.join(
      deltaTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")),
      Seq("doc_id"))
      .select(col("doc_id"), col("term"), col("tf"), col("len"))

    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "bm25_delta_file", outputMode = "update", col("doc_id"))(
      stream => stream
        .groupBy(col("doc_id"), col("term"))
        .agg(max(col("tf")).as("tf"), max(col("len")).as("len")))
    val folded = Caching.cached(emissions
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("tf")).as("tf"), max(col("len")).as("len")))

    Bm25.mergeServe(tfOld,
      folded.select(col("doc_id"), col("term"), col("tf")),
      folded.select(col("doc_id"), col("len")).distinct(), k)
      .orderBy(col("query_id"), col("rank"))
  }
}
