package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** The END-TO-END training-corpus assembly in one declarative plan — the
  * composition a user of this engine actually ships:
  *
  *   clean (lang gate → quality gate → exact dedup → split)
  *     → temperature-sample by SOURCE (alpha 0.5 rates from the SURVIVOR
  *       corpus — domain mixing; the gated corpus is monolingual by
  *       construction, the quality gate's stopword evidence being
  *       English, so the mixing axis with real spread is the source)
  *     → global shuffle (contiguous training positions + writer shards)
  *
  * emitting the final training manifest: (pos, shard, doc_id, source,
  * lang, split, n_tokens) in training order. Every stage reuses the standalone
  * operator's exact expressions and constants ([[CleanCorpus]],
  * [[Mixture.TempSalt]]'s coin, [[GlobalShuffle]]'s salt/shards), so the
  * composite cannot drift from the parts the driver certifies
  * individually — and the whole manifest is itself oracle-certified,
  * byte-for-byte, positions included.
  *
  * Scale shape, end to end: the gates and per-doc columns ride the scan
  * projection (narrow); dedup is the one content-keyed aggregation;
  * temperature rates live on |sources| rows and broadcast back; the
  * training order costs exactly ONE range shuffle (ContiguousId's
  * three-step — no single-partition window anywhere); the shard column
  * is a projection of the range key. Nothing else is data-sized.
  */
object Assemble {

  /** (pos, shard, doc_id, source, lang, split, n_tokens): the manifest. */
  def assemble(docs: DataFrame): DataFrame = {
    // source rides the clean chain's scan projection and dedup struct —
    // no corpus join to re-attach it
    // cached FIRST: the gate/dedup chain feeds BOTH the rate aggregation
    // and the sample filter below — uncached, the corpus-sized clean pass
    // would run twice (r14's advisor caught exactly that)
    val cleaned = Caching.cached(CleanCorpus.cleanUnordered(docs))
    val rates = cleaned.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("min_tokens", min(col("src_tokens"))
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("source"),
        Mixture.temperatureRatePpm(col("min_tokens"), col("src_tokens"))
          .as("rate_ppm"))
    val coin = TF.hash60(
      concat(lit(Mixture.TempSalt), col("doc_id").cast("string"))) % 1000000L
    // materialized once as well: the sampled survivor set feeds BOTH the
    // position assignment and the manifest rejoin; a deployment
    // materializes it here anyway
    val sampled = Caching.cached(cleaned.join(broadcast(rates), Seq("source"))
      .filter(coin < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("lang"), col("split"),
        col("n_tokens")))
    GlobalShuffle.shuffled(sampled.select(col("doc_id")))
      .join(sampled, Seq("doc_id"))
      .select(col("pos"), col("shard"), col("doc_id"), col("source"),
        col("lang"), col("split"), col("n_tokens"))
      .orderBy(col("pos"))
  }

  /** Driver query: the assembled training manifest of the documents table. */
  def assembleDocuments(spark: SparkSession, dir: String): DataFrame =
    assemble(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Assemble]] — the standalone stages' oracle CTEs
  * chained: the clean chain, the alpha-0.5 rates, the shared coin, the
  * shuffle order.
  */
object AssembleSql {

  val assembleDocumentsSql: String = {
    val coin =
      s"${TS.hash60(s"('${Mixture.TempSalt}' || CAST(doc_id AS VARCHAR))")} % 1000000"
    val hv = TS.hash60(
      s"('${GlobalShuffle.ShuffleSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH scored AS (
       |  SELECT doc_id, source, lang, text,
       |    ${CleanCorpusSql.scoredColsSql}
       |  FROM documents),
       |gated AS (
       |  SELECT doc_id, source, lang, text, n_tokens FROM scored
       |  WHERE ${CleanCorpusSql.gateWhereSql}),
       |cleaneds AS (
       |  SELECT doc_id, source, lang, n_tokens,
       |    ${TextAnalysisSql.splitAssignSql("doc_id")} AS split
       |  FROM (
       |    SELECT doc_id, source, lang, n_tokens,
       |      ${CleanCorpusSql.dedupRnSql} AS rn
       |    FROM gated)
       |  WHERE rn = 1),
       |srcs AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
       |  FROM cleaneds GROUP BY 1),
       |rates AS (
       |  SELECT source,
       |    ${Mixture.temperatureRatePpmSql("min(src_tokens) OVER ()", "src_tokens")}
       |      AS rate_ppm
       |  FROM srcs),
       |sampled AS (
       |  SELECT c.doc_id, c.source, c.lang, c.split, c.n_tokens
       |  FROM cleaneds c JOIN rates r USING (source)
       |  WHERE $coin < r.rate_ppm),
       |h AS (SELECT *, $hv AS hv FROM sampled)
       |SELECT row_number() OVER (ORDER BY hv, doc_id) AS pos,
       |  hv % ${GlobalShuffle.NumShards} AS shard,
       |  doc_id, source, lang, split, n_tokens
       |FROM h ORDER BY pos""".stripMargin
  }
}
