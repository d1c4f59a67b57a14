package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Caching, Dedup, DedupDelta}
import graft.sources.Tables

/** Streaming twin of [[DedupDelta.probePairs]] — the ingest-time near-dup
  * delta screen: recrawled documents arrive as file micro-batches and probe
  * the OLD snapshot's FROZEN minhash band index as a stateless stream-static
  * join chain (band -> candidate -> exact-Jaccard verify), emitting each
  * delta doc's near-dup-of-old verdicts on arrival. This is the stream-static
  * shape already certified by `q_stream_static_join`, applied to the frozen
  * index the batch delta screen freezes — the artifact is shared verbatim
  * ([[DedupDelta.frozenIndex]]), so batch and ingest screens cannot drift.
  *
  * Per-batch plan: the staged rows carry the PRE-HASHED shingle sets
  * (doc_id, sh) — the projection an ingest pipeline computes at parse time —
  * so the scan materializes `sh` and the 32 signature transforms read the
  * scanned array (the [[Dedup.minhashSignatures]] contract; an unbacked
  * expression input would re-inline the md5 hashing into every transform).
  * Each probe row explodes to its [[Dedup.Bands]] band keys carrying its own
  * shingle array — the verify stage needs only the ARRIVING doc's set plus
  * the static old sets, so no stream-stream join and no state anywhere.
  *
  * Emission surface: a pair agreeing in k > 1 bands emits k IDENTICAL rows
  * inside its micro-batch (stateless operators cannot dedupe across rows);
  * the readback collapses them with one batch-side distinct — deterministic
  * because the duplicates are byte-identical verdicts. SAME oracle as
  * `dedup_minhash_delta`.
  *
  * Scale: per-batch candidate volume is bounded by Bands x freeze-time
  * bucket cap per probe doc regardless of old-corpus size; the frozen index
  * joins bucketed-on-bk from disk at deployment scale (broadcast at test
  * scale), and the static old-sets verify join is doc-keyed against the
  * bounded candidate set.
  */
object StreamingDedupDelta {

  def minhashDeltaFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val oldSets = Caching.cached(
      Dedup.hashedShingleSets(DedupDelta.oldAugmented(docs)))
    // BOTH static sides cached as the artifacts they stand for: a streaming
    // query re-executes un-cached static subtrees every micro-batch, so
    // without these the freeze-time window and the old-sets projection
    // would re-run per batch (measured 10.7 s -> the deployment shape is
    // a frozen on-disk index, which one cache stands in for)
    val frozen = Caching.cached(
      DedupDelta.frozenIndex(oldSets, Dedup.MaxBucket))
    val oldSide = Caching.cached(oldSets.select(col("doc_id").as("old_id"),
      col("sh").as("__shb")))
    // arrivals carry (doc_id, sh, mh): an ingest pipeline computes the
    // signature NEXT TO the shingle set in its parse stage, so the per-batch
    // plan only expands band keys from the 32-slot mh array instead of
    // re-running the 32 array_min folds per batch
    val staged = Dedup.hashedShingleSets(DedupDelta.deltaDocs(docs))
      .withColumn("mh", Dedup.signatureOf(col("sh")))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "minhash_delta_file", outputMode = "append", col("doc_id"))(
      stream => stream
        .select(col("doc_id"), col("sh"),
          explode(Dedup.bandKeys(col("mh"))).as("bk"))
        .join(broadcast(frozen), Seq("bk"))
        .filter(col("doc_id") =!= col("old_id"))
        .join(oldSide, Seq("old_id"))
        .withColumn("common", size(array_intersect(col("sh"), col("__shb"))))
        .withColumn("jaccard",
          Dedup.jaccardOf(col("sh"), col("__shb"), col("common")))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_id"), col("old_id"),
          round(col("jaccard"), 6).as("jaccard")))
    emissions.distinct().orderBy(col("doc_id"), col("old_id"))
  }
}
