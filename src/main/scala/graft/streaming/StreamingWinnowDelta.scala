package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Caching, DedupDelta, Winnow}
import graft.sources.Tables

/** Streaming twin of [[DedupDelta.winnowProbePairs]] — the ingest-time
  * passage-overlap delta screen, completing the streaming square for the
  * third near-dup index family (minhash and simhash twins:
  * [[StreamingDedupDelta]], [[StreamingSimhashDelta]]): recrawled documents
  * arrive as file micro-batches and probe the OLD snapshot's FROZEN winnow
  * fingerprint postings as a stateless stream-static join, with the shared-
  * fingerprint count per (delta doc, old doc) accumulating as a monotone
  * update-mode aggregation.
  *
  * Arrivals carry (doc_id, fps) — each document's winnow fingerprint ARRAY,
  * the projection an ingest pipeline computes at parse time (one row per
  * document, so a document's fingerprints can never split across
  * micro-batches; the per-pair counts are therefore complete within each
  * doc's own batch and the update-mode max-fold readback is batch-order-
  * independent — the [[StreamingBm25Delta]] discipline). The in-stream
  * explode preserves the array's multiset verbatim, so repeated selections
  * of one fingerprint count exactly as the batch screen counts them.
  * SAME oracle as `dedup_winnow_delta`.
  *
  * Scale: per-batch candidates are bounded by fps-per-probe x freeze-time
  * cap regardless of old-corpus size; the frozen posting index is
  * broadcast at test scale and fp-bucketed on disk at deployment scale;
  * state is one counter per live (probe, old) pair.
  */
object StreamingWinnowDelta {

  def winnowDeltaFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the frozen artifact — the batch screen's builder VERBATIM, cached as
    // the persisted index it stands for
    val frozen = Caching.cached(
      DedupDelta.winnowFrozenIndex(DedupDelta.oldAugmented(docs)))
    // arrivals: parse-stage fingerprint arrays of the recrawl delta
    val staged = DedupDelta.deltaDocs(docs).select(col("doc_id"),
      graft.functions.WinnowFingerprints(col("text"),
        Winnow.ShingleK, Winnow.WindowW).as("fps"))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "winnow_delta_file", outputMode = "update", col("doc_id"))(
      stream => stream
        .select(col("doc_id"), explode(col("fps")).as("fp"))
        .join(broadcast(frozen), Seq("fp"))
        .filter(col("doc_id") =!= col("old_id"))
        .groupBy(col("doc_id"), col("old_id"))
        .agg(count(lit(1)).as("n_shared")))
    emissions.groupBy(col("doc_id"), col("old_id"))
      .agg(max(col("n_shared")).as("n_shared"))
      .orderBy(col("doc_id"), col("old_id"))
  }
}
