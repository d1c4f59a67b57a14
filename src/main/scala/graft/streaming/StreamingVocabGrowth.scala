package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.VocabGrowth
import graft.sources.Tables

/** Streaming twin of [[VocabGrowth]]: the corpus arrives as file
  * micro-batches while the per-token FIRST-SEEN table — the input to the
  * growth curve — updates incrementally: the live vocabulary tracker a
  * tokenizer owner watches as a crawl lands, without re-reading the
  * corpus.
  *
  * The incremental side is the one aggregate the curve needs:
  * [[VocabGrowth.firstSeenOf]]'s per-token min(doc_id) as an update-mode
  * streaming aggregation, monotone NONINCREASING, folded by row MIN on
  * readback (the signed complement of the [[StreamingInterleave]]
  * max-fold discipline). The band/cumulative tail reuses
  * [[VocabGrowth.growthFromFirstSeen]] verbatim. State is one
  * (token, min-id) row per distinct token — vocabulary-sized by
  * definition: the live vocabulary IS the state, which is the honest
  * floor for any online vocab tracker (Heaps' law keeps it sublinear in
  * corpus size; a capped variant would be a sketch, not this operator).
  *
  * Certified against the SAME oracle as `text_vocab_growth`; chunking
  * invariance pinned in StreamingVocabGrowthSpec.
  */
object StreamingVocabGrowth {

  /** Driver query: same growth curve as `text_vocab_growth`, with the
    * first-seen table built from `chunks` file micro-batches.
    */
  def growthFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs.select(col("doc_id"), col("text")), chunks,
      statePartitions = 8, prefix = "vocab_growth_file",
      outputMode = "update", col("doc_id")) { stream =>
      VocabGrowth.firstSeenOf(stream)
    }
    val firstSeen = emissions.groupBy(col("tok"))
      .agg(min(col("__first")).as("__first"))
    VocabGrowth.growthFromFirstSeen(docs, firstSeen)
  }
}
