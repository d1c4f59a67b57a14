package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic round-robin source interleave — the "mixture schedule
  * without sampling": round r of the output takes each source's r-th
  * document (in the SHARED training permutation, [[GlobalShuffle]]'s
  * salted hash order), so every source is represented at an equal RATE
  * from the first batch onward until it exhausts — the equal-exposure
  * guarantee proportional sampling only gives in expectation. Sources
  * that run out simply stop contributing; the schedule stays total and
  * gap-free.
  *
  * Scale shape: per-source ranks WITHOUT per-source data windows (the
  * [[StratifiedSplit]] offset construction: ONE range shuffle through
  * [[ContiguousId]] over (source, hash, doc_id), minus broadcast
  * per-source offsets), then the interleaved position is a SECOND
  * [[ContiguousId]] over (round, source) — two range shuffles total, no
  * global single-partition window anywhere.
  *
  * Exactness: ranks over salted-hash total orders, pure integer
  * arithmetic; the oracle is the two-window spelling the construction is
  * provably equivalent to.
  */
object Interleave {

  /** The hashed projection (doc_id, source, __hv) — ONE spelling shared
    * with [[graft.streaming.StreamingInterleave]]'s readback tail.
    */
  private[graft] def hashedOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      GlobalShuffle.hashOf(col("doc_id")).as("__hv"))

  /** The schedule from an externally-supplied per-source exposure count
    * table (source, n_s) — shared verbatim by the batch form (which
    * aggregates the counts in-plan) and the streaming twin (which folds
    * them from update-mode emissions). `counts` must hold exactly the
    * per-source row counts of `hashed`, or the offsets misalign.
    */
  private[graft] def orderFromCounts(hashed: DataFrame,
      counts: DataFrame): DataFrame = {
    // |sources| rows: the single-partition window is over the tiny count
    // table, never the data
    val wsrc = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("offset", sum(col("n_s")).over(wsrc) - col("n_s"))
    val rounds = ContiguousId.assign(hashed, "gpos",
        Seq(col("source"), col("__hv"), col("doc_id")))
      .join(broadcast(offsets), Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("gpos") - col("offset")).as("round"))
    ContiguousId.assign(rounds, "pos", Seq(col("round"), col("source")))
      .select(col("pos"), col("doc_id"), col("source"), col("round"))
      .orderBy(col("pos"))
  }

  /** (pos, doc_id, source, round): the gap-free interleaved training
    * order; `round` is the document's rank within its own source.
    */
  def order(docs: DataFrame): DataFrame = {
    val hashed = hashedOf(docs)
    orderFromCounts(hashed,
      hashed.groupBy(col("source")).agg(count(lit(1)).as("n_s")))
  }

  /** Driver query: the interleaved schedule of the documents corpus. */
  def orderDocuments(spark: SparkSession, dir: String): DataFrame =
    order(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[Interleave]] — the two-window spelling: per-source
  * row_number in the shared permutation, then a global row_number over
  * (round, source).
  */
object InterleaveSql {

  val orderDocumentsSql: String = {
    val hv = TS.hash60(
      s"('${GlobalShuffle.ShuffleSalt}' || CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (SELECT doc_id, source, $hv AS hv FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
       |      AS round
       |  FROM h)
       |SELECT row_number() OVER (ORDER BY round, source) AS pos,
       |  doc_id, source, round
       |FROM r ORDER BY pos""".stripMargin
  }
}
