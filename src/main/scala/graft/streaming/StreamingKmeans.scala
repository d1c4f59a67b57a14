package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import graft.sources.Tables

/** Streaming twin of [[Similarity.kmeansStep]]: the Lloyd refinement
  * update maintained INCREMENTALLY over streamed embedding ingest —
  * the continuous-training-corpus shape where vectors arrive as files and
  * the codebook statistics must stay current without re-scanning history.
  * SAME oracle as the batch `emb_kmeans_step`.
  *
  * Design for bounded state, the part that matters:
  *
  *  - The per-vector argmax CANNOT be a streaming groupBy (per-vec state
  *    would grow with the corpus, and update mode forbids chaining it
  *    into the grid aggregation anyway). Instead the codebook — KB-sized
  *    by construction, the broadcast side of every batch sibling — is
  *    collected once from the STATIC init slice and unrolled into K
  *    scored literal expressions per row: the assignment becomes a pure
  *    narrow projection (argmax = array_position of the max score, ties
  *    to the lowest cid exactly like the batch max_by's (ccos, -cid)).
  *    No input row touches the driver; only the codebook does.
  *
  *  - The ONE stateful operator is the (cid, pos) grid aggregation:
  *    K x Dim entries regardless of corpus size. Components are signed,
  *    so the cumulative sum is NOT monotone and the usual final-is-max
  *    readback fold would be wrong; the state splits each sum into
  *    positive and negative parts (both cumulative sums of non-negative
  *    terms, hence monotone), and the fold reassembles
  *    s = max(sum_pos) - max(sum_neg). Exact-integer 1e6-scaled
  *    components end-to-end, so no accumulation-order boundary exists.
  */
object StreamingKmeans {

  /** The raw (vec_id, embedding) replay frame. */
  private[streaming] def embRows(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  /** The streaming plan: stateless literal-codebook argmax + the grid
    * aggregation with monotone-decomposed signed sums. The codebook —
    * KB-sized by construction, the broadcast side of every batch sibling —
    * is collected ONCE; no input row ever touches the driver.
    */
  private[streaming] def gridAgg(spark: SparkSession,
      dir: String): DataFrame => DataFrame = {
    val cents = Similarity
      .centroidsOf(Similarity.withNormOf(embRows(spark, dir)), 16)
      .orderBy(col("cid")).collect()
    val cids = cents.map(_.getLong(0))
    val scoreCols: Array[Column] = cents.map { r =>
      val cvec = typedlit(r.getSeq[Float](1))
      val nn = VF.norm(col("embedding")) * lit(r.getDouble(2))
      when(nn === 0.0, 0.0).otherwise(VF.dot(col("embedding"), cvec) / nn)
    }
    val scores = array(scoreCols: _*)
    // first position of the max score = lowest cid among ties — the batch
    // max_by's (ccos desc, cid asc) order, per-row and stateless
    val bestCid = element_at(typedlit(cids.toSeq),
      array_position(scores, array_max(scores)).cast("int"))
    stream =>
      stream
        .select(bestCid.as("cid"),
          posexplode(transform(col("embedding"),
            x => floor(x.cast("double") * 1e6).cast("long"))).as(Seq("pos", "sv")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("sv") > 0, col("sv")).otherwise(0L)).as("sum_pos"),
          sum(when(col("sv") < 0, -col("sv")).otherwise(0L)).as("sum_neg"))
  }

  /** Cumulative non-negative sums are monotone: final = per-key row max,
    * then reassemble the signed sum and the floored integer mean.
    */
  private[streaming] def foldGrid(emissions: DataFrame): DataFrame =
    emissions.groupBy(col("cid"), col("pos"))
      .agg(max(col("n")).as("n_members"),
        (max(col("sum_pos")) - max(col("sum_neg"))).as("s"))
      .select(col("cid"), col("pos").cast("long").as("pos"), col("n_members"),
        floor(col("s").cast("double") / col("n_members")).cast("long")
          .as("centroid_micro"))
      .orderBy(col("cid"), col("pos"))

  def lloydStepFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame =
    foldGrid(ReplayHarness.emissionsFromFiles(
      spark, embRows(spark, dir), chunks, statePartitions = 4,
      prefix = "kmeans_file", outputMode = "update",
      col("vec_id"))(gridAgg(spark, dir)))
}
