package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import graft.sources.Tables

/** Streaming twin of [[Similarity.ivfAssign]] — incremental maintenance
  * of the IVF inverted-list membership: new vectors stream in as file
  * micro-batches and are assigned to their cell against the FROZEN coarse
  * codebook (the previous build's centroids — here
  * [[Similarity.centroidsOf]] over the static table, exactly the batch
  * build's codebook). Assignment is a pure per-row argmax, so the stream
  * stays STATELESS: append mode, emit-on-arrival, no aggregation state.
  *
  * Per-row respelling, pinned pair-for-pair against the batch spelling
  * (StreamingIvfAssignSpec): the batch [[Similarity.nearestCentroids]]
  * argmax is a row_number window, which a stateless stream cannot host;
  * here the codebook collapses to ONE broadcast row (sorted
  * (cid, cvec, cnrm) struct array) and the argmax is `array_max` over
  * (ccos, -cid) structs — the kmeansStep tie convention (highest cosine,
  * then lowest cid), evaluated inside the row's projection. The cosine is
  * the batch form's expression verbatim, so the doubles are identical.
  *
  * Scale shape: the broadcast codebook is nCentroids x Dim (KBs,
  * corpus-scale-free); the stream side is one norm + join + projection,
  * shuffle-free before the sink.
  */
object StreamingIvfAssign {

  /** The frozen codebook reshaped for the stream side: ONE row holding
    * the sorted (cid, cvec, cnrm) struct array under a constant join key.
    */
  private[streaming] def codebookRow(centroids: DataFrame): DataFrame =
    centroids
      .agg(array_sort(collect_list(
        struct(col("cid"), col("cvec"), col("cnrm")))).as("cents"))
      .withColumn("__one", lit(1))

  /** The stateless per-row assignment — shared by the streaming run and
    * the spec's batch-frame pinning run.
    */
  private[streaming] def assignRows(rows: DataFrame,
      cbRow: DataFrame): DataFrame = {
    val scored = rows
      .select(col("vec_id"), col("embedding"),
        VF.norm(col("embedding")).as("nrm"), lit(1).as("__one"))
      .join(broadcast(cbRow), Seq("__one"))
    val best = array_max(transform(col("cents"), c => {
      val nn = col("nrm") * c.getField("cnrm")
      struct(
        when(nn === 0.0, 0.0)
          .otherwise(VF.dot(col("embedding"), c.getField("cvec")) / nn)
          .as("ccos"),
        (-c.getField("cid")).as("ncid"))
    }))
    scored.select(col("vec_id"), (-best.getField("ncid")).as("cid"))
  }

  /** Driver query: same (vec_id, cid) artifact as `emb_ivf_assign`, with
    * the corpus arriving as `chunks` file micro-batches.
    */
  def assignFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cbRow = codebookRow(
      Similarity.centroidsOf(Similarity.withNormOf(emb), 16))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, emb.select(col("vec_id"), col("embedding")), chunks,
      statePartitions = 4, prefix = "ivf_assign_file",
      outputMode = "append", col("vec_id")) { stream =>
      assignRows(stream, cbRow)
    }
    emissions.orderBy(col("vec_id"))
  }
}
