package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Collocations
import graft.sources.Tables

/** Streaming twin of [[Collocations]]: the corpus arrives as file-source
  * micro-batches and the pair-count core builds incrementally, so the
  * collocation report refreshes as ingest proceeds without a full corpus
  * re-read.
  *
  * The incremental side is an update-mode `groupBy(w1, w2).count()` over
  * per-row adjacent pairs. Cumulative counts are monotone nondecreasing,
  * so the final per-pair count is the row max of the emissions,
  * batch-order-independent (the [[StreamingCorpusDrift]] fold). The PMI
  * tail reuses [[Collocations.scoreTail]] verbatim on the folded table —
  * certified against the SAME oracle as the batch form.
  *
  * Pair spelling: the batch operator extracts bigrams via a per-doc
  * `lead()` window, which streaming aggregation cannot host (non-time
  * windows are unsupported on streams). Documents arrive whole, so the
  * twin zips each row's token array with its own tail —
  * `arrays_zip(slice, slice)` over the lowered, empty-filtered tokens,
  * the array aliased in its OWN projection so CollapseProject's non-cheap
  * guard keeps the tokenize-filter pass at once per row. The hash match
  * against the shared oracle certifies the two spellings equivalent.
  *
  * State: one counter per live (w1, w2) — the vocabulary-sized pair
  * domain, the operator's own intermediate (same bound as the batch
  * shuffle), not corpus-sized.
  */
object StreamingCollocations {

  /** Per-row adjacent lowered token pairs — the streaming-legal bigram
    * spelling (see scaladoc).
    */
  private[streaming] def pairsOf(docs: DataFrame): DataFrame =
    docs
      .select(filter(transform(TF.tokens(col("text")), t => lower(t)),
        t => length(t) > 0).as("arr"))
      .select(
        slice(col("arr"), lit(1),
          greatest(size(col("arr")) - 1, lit(0))).as("h"),
        slice(col("arr"), lit(2),
          greatest(size(col("arr")) - 1, lit(0))).as("t"))
      .select(explode(arrays_zip(col("h"), col("t"))).as("p"))
      .select(col("p.h").as("w1"), col("p.t").as("w2"))

  /** Driver query: same top collocations as `text_collocations`, with the
    * corpus consumed as `chunks` real file-source micro-batches.
    */
  def topFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, docs, chunks, statePartitions = 4,
      prefix = "colloc_file", outputMode = "update", col("doc_id")) { stream =>
      pairsOf(stream).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    }
    Collocations.scoreTail(emissions.groupBy(col("w1"), col("w2"))
      .agg(max(col("n")).as("n_pair")))
  }
}
