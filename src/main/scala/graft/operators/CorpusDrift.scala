package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Corpus drift monitor: per-source token-distribution distance between two
  * snapshots of a recrawled corpus — the health check a pipeline runs
  * before retraining on a new crawl ("did domain X's content shift, or
  * just grow?"). Uses the same deterministic snapshot carve as
  * [[CorpusDiff]] (same moduli), so the drift this measures is exactly the
  * add/remove/change traffic that operator classifies.
  *
  * Metric: unnormalized total-variation distance. For per-source totals
  * O and N, `drift_num = Σ_t |o_t·N − n_t·O|` is a pure INTEGER (no
  * per-token division anywhere), and `TV = drift_num / (2·O·N)` is
  * reported as the integer-exact `tv_ppm = drift_num·1e6 div (2·O·N)`.
  * At gate scales every product fits comfortably in an int64; a 100 TB
  * deployment swaps the two product expressions to DECIMAL(38,0) (Spark)
  * / HUGEINT (DuckDB) — the shape is otherwise unchanged.
  *
  * Scale shape: ONE data-sized shuffle — both snapshots union with a side
  * flag and aggregate to the per-(source, token) old/new count pairs in a
  * single map-side-combined pass (conditional sums, not two aggregations
  * joined). Everything after runs on vocabulary-sized rows: per-source
  * totals (broadcast back over |sources| rows) and the final per-source
  * fold.
  */
object CorpusDrift {

  /** One snapshot side tokenized to (source, token) rows — the one
    * tokenization spelling every form shares.
    */
  private[graft] def sideToks(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(TF.tokens(col("text"))).as("__raw"))
    .select(col("source"), lower(col("__raw")).as("token"))
    .filter(length(col("token")) > 0)

  /** The TV tail over merged per-(source, token) count pairs (o, n) —
    * ONE spelling shared by the batch form and the streaming twin, so the
    * drift arithmetic cannot drift between them. Vocabulary-sized input.
    *
    * Degenerate guard: a source present in only one snapshot (or with zero
    * tokens on a side) has TV distance exactly 1, but the ppm divisor
    * `2*o_total*n_total` is 0 there — Spark `div` yields NULL while DuckDB
    * `//` raises, so instead of diverging engines both spellings emit the
    * mathematically correct sentinel 1000000 (TV = 1) via the same CASE.
    */
  private[graft] def tvTail(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("o")).as("o_total"), sum(col("n")).as("n_total"))
    counts.join(broadcast(totals), Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("o_total")).as("o_total"), max(col("n_total")).as("n_total"),
        sum(abs(col("o") * col("n_total") - col("n") * col("o_total")))
          .as("drift_num"))
      .withColumn("tv_ppm",
        expr("""CASE WHEN o_total = 0 OR n_total = 0 THEN CAST(1000000 AS BIGINT)
               |     ELSE (drift_num * 1000000) div (2 * o_total * n_total)
               |END""".stripMargin))
  }

  /** (source, o_total, n_total, drift_num, tv_ppm) per source. */
  def drift(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val counts = sideToks(oldDocs).withColumn("__side", lit(0L))
      .unionAll(sideToks(newDocs).withColumn("__side", lit(1L)))
      .groupBy(col("source"), col("token"))
      .agg(sum(when(col("__side") === 0L, 1L).otherwise(0L)).as("o"),
        sum(when(col("__side") === 1L, 1L).otherwise(0L)).as("n"))
    tvTail(counts)
  }

  /** The carved snapshots WITH source (the [[CorpusDiff]] carve keeps only
    * doc_id/text) — shared by the batch and streaming driver queries.
    */
  private[graft] def oldCarve(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % CorpusDiff.AddedMod =!= 0)
      .select(col("source"),
        when(col("doc_id") % CorpusDiff.ChangedMod === 0,
          concat(col("text"), lit(" [stale]"))).otherwise(col("text")).as("text"))

  private[graft] def newCarve(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % CorpusDiff.RemovedMod =!= 1)
      .select(col("doc_id"), col("source"), col("text"))

  /** Driver query: drift between the carved snapshots of documents. */
  def driftDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    drift(oldCarve(docs), newCarve(docs)).orderBy(col("source"))
  }
}

/** DuckDB oracle for [[CorpusDrift]] — same carve, same tokenization, same
  * integer TV numerator and ppm division.
  */
object CorpusDriftSql {
  import CorpusDiff.{AddedMod, ChangedMod, RemovedMod}

  val driftDocumentsSql: String =
    s"""WITH old_docs AS (
       |  SELECT source,
       |    CASE WHEN doc_id % $ChangedMod = 0 THEN text || ' [stale]'
       |         ELSE text END AS text
       |  FROM documents WHERE doc_id % $AddedMod <> 0),
       |new_docs AS (
       |  SELECT source, text FROM documents WHERE doc_id % $RemovedMod <> 1),
       |toks AS (
       |  SELECT source, lower(token) AS token, 0 AS side FROM (
       |    SELECT source, unnest(${TS.tokens("text")}) AS token FROM old_docs)
       |  WHERE token <> ''
       |  UNION ALL
       |  SELECT source, lower(token) AS token, 1 AS side FROM (
       |    SELECT source, unnest(${TS.tokens("text")}) AS token FROM new_docs)
       |  WHERE token <> ''),
       |counts AS (
       |  SELECT source, token,
       |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o,
       |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM toks GROUP BY 1, 2),
       |totals AS (
       |  SELECT source, CAST(sum(o) AS BIGINT) AS o_total,
       |         CAST(sum(n) AS BIGINT) AS n_total
       |  FROM counts GROUP BY 1)
       |SELECT c.source, t.o_total, t.n_total,
       |  CAST(sum(abs(c.o * t.n_total - c.n * t.o_total)) AS BIGINT)
       |    AS drift_num,
       |  CAST(CASE WHEN t.o_total = 0 OR t.n_total = 0 THEN 1000000
       |       ELSE sum(abs(c.o * t.n_total - c.n * t.o_total)) * 1000000
       |         // (2 * t.o_total * t.n_total) END AS BIGINT) AS tv_ppm
       |FROM counts c JOIN totals t USING (source)
       |GROUP BY 1, 2, 3
       |ORDER BY c.source""".stripMargin
}
