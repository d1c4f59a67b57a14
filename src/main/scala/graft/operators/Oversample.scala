package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic oversampling — the upweighting complement to
  * [[Mixture]] (which derives keep-rates ≤ 1 and can only DOWNsample):
  * under-represented sources replicate toward the largest source's token
  * mass, with the replication factor capped at [[CapMilli]] (don't
  * repeat any document more than ~4x — the standard data-repetition
  * guard: past a few epochs of the same text, marginal training value
  * collapses while memorization risk grows). The output is the epoch
  * replication manifest: one row per (document, copy).
  *
  * Fractional factors use the [[Mixture]] coin discipline: a factor of
  * f_milli yields `f_milli div 1000` whole copies plus one more iff
  * `hash60(salt ‖ doc_id) % 1000 < f_milli % 1000` — a pure function of
  * doc_id, reproducible across runs, engines, and cluster sizes, and
  * unbiased across each source (hash residues are uniform).
  *
  * Scale shape: the factor table is one map-side-combined agg to
  * |sources| rows (window over those rows only); the manifest is a
  * broadcast join + `sequence` explode on a NARROW (id, source)
  * projection — text never replicates here; the manifest carries ids,
  * and the training reader fetches bytes once per distinct doc.
  */
object Oversample {

  /** Max replication factor in milli-units (4x). */
  val CapMilli = 4000L

  val Salt = "ovs:"

  /** The narrow (doc_id, source, n_tokens) projection — one spelling
    * shared with [[graft.streaming.StreamingOversample]].
    */
  private[graft] def toksOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"))

  /** The manifest from an externally-supplied (source, src_tokens) table
    * — shared verbatim by the batch form (which aggregates the sums
    * in-plan) and the streaming twin (which folds them from update-mode
    * emissions). `srcTokens` must hold exactly the per-source token sums
    * of `toks`, or the factors misprice.
    */
  private[graft] def manifestFromSourceTokens(toks: DataFrame,
      srcTokens: DataFrame): DataFrame = {
    // `greatest(src_tokens, 1)` guards the zero-mass edge: under the shared
    // split convention nTokens('') = 1 so no source can reach mass 0 from
    // `toks`, but an externally-supplied srcTokens table could — and the
    // engines would then DIVERGE silently (Spark non-ANSI div yields null
    // and drops the source; DuckDB // raises). The guard (mirrored in the
    // oracle) makes both engines price a zero-mass source at the cap
    // instead: the defined, loud-in-the-manifest choice.
    val factors = srcTokens
      .withColumn("max_tokens", max(col("src_tokens"))
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("source"),
        expr(s"least(${CapMilli}L, (max_tokens * 1000) div greatest(src_tokens, 1L))")
          .as("f_milli"))
    val fracCoin = TF.hash60(concat(lit(Salt), col("doc_id").cast("string"))) % 1000L
    toks.join(broadcast(factors), Seq("source"))
      .withColumn("n_copies", expr("f_milli div 1000") +
        when(fracCoin < col("f_milli") % 1000L, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  /** (doc_id, source, n_copies, copy_idx) — the replication manifest,
    * ordered by (doc_id, copy_idx).
    */
  def manifest(docs: DataFrame): DataFrame = {
    val toks = toksOf(docs)
    manifestFromSourceTokens(toks,
      toks.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens")))
  }

  /** Driver query: the oversampling manifest of the documents corpus. */
  def manifestDocuments(spark: SparkSession, dir: String): DataFrame =
    manifest(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Oversample]] — same factor arithmetic, same coin,
  * same explode.
  */
object OversampleSql {

  val manifestDocumentsSql: String = {
    val coin = TS.hash60(s"('${Oversample.Salt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(${TS.nTokens("text")} AS BIGINT) AS n_tokens
       |  FROM documents),
       |f AS (
       |  SELECT source,
       |    least(${Oversample.CapMilli},
       |      (max(CAST(sum(n_tokens) AS BIGINT)) OVER () * 1000) //
       |        greatest(CAST(sum(n_tokens) AS BIGINT), 1)) AS f_milli
       |  FROM toks GROUP BY source),
       |c AS (
       |  SELECT t.doc_id, t.source,
       |    f.f_milli // 1000 +
       |      (CASE WHEN $coin % 1000 < f.f_milli % 1000 THEN 1 ELSE 0 END)
       |      AS n_copies
       |  FROM toks t JOIN f USING (source))
       |SELECT doc_id, source, n_copies,
       |  unnest(range(1, n_copies + 1)) AS copy_idx
       |FROM c
       |ORDER BY doc_id, copy_idx""".stripMargin
  }
}
