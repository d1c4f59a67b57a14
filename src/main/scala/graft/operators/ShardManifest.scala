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
}
