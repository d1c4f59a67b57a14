package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.operators.ProductQuantization
import graft.sources.Tables

/** Streaming twin of [[ProductQuantization.pqCodes]] — incremental
  * maintenance of the ANN index ARTIFACT itself: under corpus growth a
  * serving system does not re-encode its corpus per snapshot; new vectors
  * stream in and their PQ codes are a pure per-row map against the FROZEN
  * sub-codebook (the persisted build-time artifact — here
  * [[ProductQuantization.subCodebook]] of the static table, exactly the
  * batch build's codebook). This is the honest incremental form: encoding
  * is embarrassingly row-local, so the stream stays STATELESS — no
  * aggregation state, no watermark, each arriving vector emits its M
  * codes in the micro-batch it arrives in (append mode, emit-on-arrival).
  *
  * Per-row respelling, pinned pair-for-pair against the batch spelling
  * (StreamingPqCodesSpec): the batch `encodePacked` argmin is a keyed
  * `min_by` aggregation, which a stateless stream cannot host; here the
  * codebook is reshaped to ONE broadcast row per subspace (m -> sorted
  * (code, cvec) array, a stream-static equi-join) and the argmin is
  * `array_min` over (d_micro, code) structs — the same (min distance,
  * ties to lowest code) contract, evaluated entirely inside the row's
  * projection. Distances are the batch form's exact micro-integers
  * (floor(sqDist x 1e6) longs), so codes are bit-identical.
  *
  * Scale shape: the broadcast codebook row set is NumSub rows x NumCodes
  * structs (KBs, corpus-scale-free); the stream side is one narrow
  * posexplode + join + projection — whole-stage-codegen, shuffle-free
  * before the sink. Certified against the SAME DuckDB oracle as
  * `emb_pq_codes`.
  */
object StreamingPqCodes {
  import ProductQuantization.{NumSub, SubDim}

  /** The frozen codebook reshaped for the stream side: one row per
    * subspace, codewords as a (code, cvec) struct array sorted by code.
    */
  private[graft] def codebookRows(cb: DataFrame): DataFrame =
    cb.groupBy(col("m"))
      .agg(array_sort(collect_list(struct(col("code"), col("cvec"))))
        .as("cbs"))

  /** The stateless per-row encode — shared by the streaming aggregation
    * and the spec's batch-frame pinning run.
    */
  private[graft] def encodeRows(rows: DataFrame,
      cbRows: DataFrame): DataFrame =
    rows
      .select(col("vec_id"),
        posexplode(array((0 until NumSub).map(m =>
          slice(col("embedding"), m * SubDim + 1, SubDim)): _*))
          .as(Seq("m", "sv")))
      .join(broadcast(cbRows), Seq("m"))
      .select(col("vec_id"), col("m"),
        array_min(transform(col("cbs"), c =>
          struct(
            floor(VF.sqDist(col("sv"), c.getField("cvec")) * 1e6)
              .cast("long").as("d_micro"),
            c.getField("code").as("code"))))
          .getField("code").as("code"))

  /** Driver query: same (vec_id, m, code) index as `emb_pq_codes`, with
    * the corpus arriving as `chunks` file micro-batches.
    */
  def codesFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cbRows = codebookRows(ProductQuantization.subCodebook(emb))
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, emb.select(col("vec_id"), col("embedding")), chunks,
      statePartitions = 4, prefix = "pq_codes_file",
      outputMode = "append", col("vec_id")) { stream =>
      encodeRows(stream, cbRows)
    }
    // append mode over a stateless projection: each (vec_id, m) emits
    // exactly once — no fold, just the batch form's presentation order
    emissions.orderBy(col("vec_id"), col("m"))
  }
}
