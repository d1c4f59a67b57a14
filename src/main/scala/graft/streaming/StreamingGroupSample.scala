package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TopKAgg}
import graft.operators.BoundedTopK
import graft.sources.Tables

/** Streaming twin of [[BoundedTopK.sampleDocsPerLang]] — the classic
  * bottom-k-hash trick read the other way around: the k smallest salted
  * hashes of the documents seen SO FAR are a uniform random sample of
  * them, so maintaining the bounded top-k aggregate incrementally (the
  * serialized O(k) buffer per language is the streaming aggregation
  * state, the same mechanism [[StreamingKmv]] certifies for the KMV
  * sketch) yields an always-current per-group uniform sample of an
  * unbounded stream at O(groups x k) state — no reservoir bookkeeping,
  * no replay, and any two nodes that saw the same set of documents hold
  * the SAME sample regardless of arrival order (merge-of-top-k is
  * top-k of the union).
  *
  * The fold keys each language's final emission by its max rows-seen
  * count (update-mode emissions only fire when a group changes, so
  * `n_seen` strictly increases across a group's emissions).
  *
  * Oracle: the SAME row_number window SQL as the batch form — the sample
  * of the whole replayed corpus.
  */
object StreamingGroupSample {

  def sampleDocsPerLangFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val h = TF.hash60(concat(lit(BoundedTopK.KSampleSalt),
      col("doc_id").cast("string")))
    val staged = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"), h.as("h"))
    foldEmissions(ReplayHarness.emissionsFromFiles(
      spark, staged, chunks, statePartitions = 4,
      prefix = "gsample_file", outputMode = "update",
      col("lang"), col("doc_id"))(
      _.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_seen"),
          TopKAgg.agg(-col("h"), col("doc_id"), BoundedTopK.SampleK).as("top"))))
  }

  /** Each group's final emission is the one at its max n_seen stamp. */
  private[streaming] def foldEmissions(emissions: DataFrame): DataFrame = {
    val last = emissions.groupBy(col("lang")).agg(max(col("n_seen")).as("n_seen"))
    emissions.join(last, Seq("lang", "n_seen"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), (-col("col.value")).as("h"))
      .orderBy(col("lang"), col("rank"))
  }
}
