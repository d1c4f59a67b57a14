package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** EXACT-count stratified train/valid/test split: within every source,
  * exactly ⌊80%⌋ / ⌊10%⌋-ish / remainder documents by integer boundaries
  * on a content-addressed order — the eval-fairness guarantee the
  * hash-bucket split (`text_split`, proportions only in expectation)
  * cannot give: a 30-doc domain gets exactly 24/3/3, never 27/1/2.
  *
  * Scale shape — per-source ranks WITHOUT a per-source data window (the
  * quality-filter lesson, generalized to contiguous ranks): ONE range
  * shuffle over (source, hash, doc_id) through [[ContiguousId]] yields
  * global contiguous positions in which sources are contiguous blocks;
  * the per-source rank is the global position minus the source's offset
  * (the exclusive cumulative count over the |sources|-row count table,
  * broadcast back). Boundaries compare cross-multiplied integers
  * (`rank·100 ≤ pct·n_s`), no division.
  *
  * The order hash is salted independently of `text_split`'s assignment
  * hash, so the two split operators are uncorrelated by construction.
  */
object StratifiedSplit {

  val TrainPct = 80L
  val ValidPct = 90L // cumulative: valid is (80, 90]

  val StratSalt = "strat:"

  /** (doc_id, source, split): exact per-source counts. */
  def split(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("source"),
      TF.hash60(concat(lit(StratSalt), col("doc_id").cast("string"))).as("__hv"))
    val counts = hashed.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val wsrc = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // |sources| rows: the single-partition window is over the tiny count
    // table, never the data
    val offsets = counts
      .withColumn("offset", sum(col("n_s")).over(wsrc) - col("n_s"))
    val positioned = ContiguousId.assign(hashed, "gpos",
        Seq(col("source"), col("__hv"), col("doc_id")))
      .join(broadcast(offsets), Seq("source"))
      .withColumn("rank", col("gpos") - col("offset"))
    positioned.select(col("doc_id"), col("source"),
      when(col("rank") * 100 <= lit(TrainPct) * col("n_s"), "train")
        .when(col("rank") * 100 <= lit(ValidPct) * col("n_s"), "valid")
        .otherwise("test").as("split"))
  }

  /** Driver query: the exact stratified split of the documents table. */
  def splitDocuments(spark: SparkSession, dir: String): DataFrame =
    split(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[StratifiedSplit]] — the windowed row_number
  * spelling the offset construction is provably equivalent to (rank =
  * global contiguous position within the source block = row_number under
  * the same (hv, doc_id) total order).
  */
object StratifiedSplitSql {
  import StratifiedSplit._

  val splitDocumentsSql: String = {
    val hv = TS.hash60(s"('$StratSalt' || CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (SELECT doc_id, source, $hv AS hv FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rank,
       |    count(*) OVER (PARTITION BY source) AS n_s
       |  FROM h)
       |SELECT doc_id, source,
       |  CASE WHEN rank * 100 <= $TrainPct * n_s THEN 'train'
       |       WHEN rank * 100 <= $ValidPct * n_s THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM r ORDER BY doc_id""".stripMargin
  }
}
