package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Token-budget shard manifest — the "write the corpus to training
  * shards" step: documents packed greedily into fixed-token-budget shards
  * IN THE TRAINING ORDER (the [[GlobalShuffle]] permutation, one spelling
  * shared), each document assigned to the shard its first token lands in.
  * Unlike `text_pack_sequences` (hash-dealt shards, per-shard windows —
  * the parallel writer's layout), this is the sequential-reader layout: a
  * trainer streaming shard k reads exactly the permutation interval
  * [k·B, ...), so shard boundaries ARE training-progress checkpoints.
  *
  * Scale shape: token offsets come from [[PrefixSum]] (range shuffle +
  * per-partition scan — one Long per partition crosses the driver, never
  * a global window); the manifest is then ONE map-side-combined
  * aggregation to the |corpus-tokens| / B shard domain.
  *
  * Exactness: integer token counts, integer `div` on the non-negative
  * cumulative offset, the shared salted-hash training order (total order
  * via the doc_id tiebreaker).
  */
object ShardManifest {

  /** Token budget per shard. */
  val ShardTokens = 4096L

  /** (shard_id, n_docs, n_tokens, start_offset): the per-shard manifest;
    * `start_offset` is the global token offset where the shard's first
    * document begins (its drift above shard_id·B measures boundary
    * overflow accumulated from straddling documents).
    */
  def manifest(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      GlobalShuffle.hashOf(col("doc_id")).as("__hv"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
    PrefixSum.withRunningTotal(toks, "n_tokens", "__cum",
        Seq(col("__hv"), col("doc_id")))
      .select(col("n_tokens"), (col("__cum") - col("n_tokens")).as("__before"))
      .select(col("n_tokens"), col("__before"),
        expr(s"__before div ${ShardTokens}L").as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("__before")).as("start_offset"))
      .orderBy(col("shard_id"))
  }

  /** Driver query: the shard manifest of the documents corpus. */
  def manifestDocuments(spark: SparkSession, dir: String): DataFrame =
    manifest(Tables.documents(spark, dir))

  /** Resume-from-checkpoint manifest — restart a training run at global
    * token offset R WITHOUT replaying the consumed prefix: the documents
    * whose token span [start_offset, start_offset + n_tokens) ends after
    * R, in training order, with `skip_tokens` = how far into the
    * straddling document the reader seeks (0 for every later doc). R is
    * pinned to half the corpus's token mass (integer `div` — a
    * deterministic mid-run checkpoint), so both engines derive the same
    * resume point from the data alone.
    *
    * Scale shape: the same [[PrefixSum]] offsets as [[manifest]] (one
    * Long per partition crosses the driver), the resume point is a
    * single-row broadcast (counted cross-join pattern), and the filter
    * prunes the consumed prefix BEFORE anything wide happens — the
    * output is the remaining work, which is the point.
    */
  def resumeManifest(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      GlobalShuffle.hashOf(col("doc_id")).as("__hv"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))
    val resumeAt = toks.agg(
      expr("CAST(sum(n_tokens) AS BIGINT) div 2").as("__resume"))
    PrefixSum.withRunningTotal(toks, "n_tokens", "__cum",
        Seq(col("__hv"), col("doc_id")))
      .select(col("doc_id"), col("n_tokens"),
        (col("__cum") - col("n_tokens")).as("__before"))
      .crossJoin(broadcast(resumeAt))
      .filter(col("__before") + col("n_tokens") > col("__resume"))
      .select(col("doc_id"),
        expr(s"__before div ${ShardTokens}L").as("shard_id"),
        col("__before").as("start_offset"),
        greatest(col("__resume") - col("__before"), lit(0L)).as("skip_tokens"))
      .orderBy(col("start_offset"))
  }

  /** Driver query: the resume manifest of the documents corpus. */
  def resumeManifestDocuments(spark: SparkSession, dir: String): DataFrame =
    resumeManifest(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[ShardManifest]] — same salt/hash training order,
  * same windowed cumulative spelling of the prefix sum, same greedy
  * first-token shard rule.
  */
object ShardManifestSql {

  val manifestDocumentsSql: String = {
    val hv = TS.hash60(
      s"('${GlobalShuffle.ShuffleSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH t AS (
       |  SELECT doc_id, $hv AS hv,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY hv, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS bef
       |  FROM t)
       |SELECT bef // ${ShardManifest.ShardTokens} AS shard_id,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(bef) AS start_offset
       |FROM c
       |GROUP BY 1
       |ORDER BY shard_id""".stripMargin
  }

  /** Mirror of [[ShardManifest.resumeManifest]] — same training order,
    * same prefix-sum spelling, same half-mass resume point.
    */
  val resumeManifestDocumentsSql: String = {
    val hv = TS.hash60(
      s"('${GlobalShuffle.ShuffleSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH t AS (
       |  SELECT doc_id, $hv AS hv,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY hv, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
       |      AS BIGINT) AS bef
       |  FROM t),
       |r AS (SELECT CAST(sum(n_tokens) AS BIGINT) // 2 AS rp FROM t)
       |SELECT doc_id,
       |  bef // ${ShardManifest.ShardTokens} AS shard_id,
       |  bef AS start_offset,
       |  greatest(rp - bef, 0) AS skip_tokens
       |FROM c, r
       |WHERE bef + n_tokens > rp
       |ORDER BY start_offset""".stripMargin
  }
}
