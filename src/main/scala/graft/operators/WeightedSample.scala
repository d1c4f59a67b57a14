package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Deterministic weighted sampling without replacement — probability-
  * proportional-to-size selection with NO RNG state, via hash
  * replication: a document of integer weight w gets w salted hashes and
  * its priority is their MINIMUM, so heavier docs are proportionally more
  * likely to hold a globally small priority, and the bottom-k by priority
  * is the weighted sample (the integer-exact cousin of A-ES/priority
  * sampling, which needs float pow). Training pipelines use exactly this
  * to upsample long/high-quality documents reproducibly.
  *
  * Scale shape: the priority is computed entirely INSIDE the row — a
  * sequence/transform/array_min over at most [[MaxWeight]] hashes, narrow
  * and codegen'd, no explode and no shuffle — and the bottom-k is a
  * TakeOrdered (per-partition top-k, k rows per partition to the driver,
  * never a global sort). Content-addressed (the [[Mixture]] coin
  * discipline): re-running on a re-partitioned, re-ordered, or appended
  * corpus never flips an existing doc's priority.
  */
object WeightedSample {

  /** Weight = 1 + min(n_chars/100, 7): 1..8, long docs upsampled. */
  val WeightDivisor = 100L
  val MaxExtraWeight = 7L

  val SampleK = 100

  val WeightedSalt = "ws:"

  /** (doc_id, weight, priority): the k winners by (priority, doc_id). */
  def sample(docs: DataFrame, k: Int = SampleK): DataFrame = {
    // integer `div` (n_chars is non-negative), spelled the same way the
    // oracle's BIGINT `//` floors — no float op in the weight at all
    val w = (lit(1L) + least(expr(s"n_chars div $WeightDivisor").cast("long"),
      lit(MaxExtraWeight))).as("weight")
    val priority = array_min(transform(
      sequence(lit(1L), col("weight")),
      i => TF.hash60(concat(lit(WeightedSalt), col("doc_id").cast("string"),
        lit(":"), i.cast("string"))))).as("priority")
    docs.select(col("doc_id"), w)
      .select(col("doc_id"), col("weight"), priority)
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }

  /** Driver query: the weighted sample of the documents table. */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    sample(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[WeightedSample]] — same weights, same salted
  * min-hash priority, same total order.
  */
object WeightedSampleSql {
  import WeightedSample._

  val sampleDocumentsSql: String = {
    val hv = TS.hash60(
      s"('$WeightedSalt' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))")
    s"""SELECT doc_id, weight, priority FROM (
       |  SELECT doc_id, weight,
       |    list_min(list_transform(range(1, weight + 1), i -> $hv)) AS priority
       |  FROM (SELECT doc_id,
       |          1 + least(n_chars // $WeightDivisor, $MaxExtraWeight) AS weight
       |        FROM documents))
       |ORDER BY priority, doc_id LIMIT $SampleK""".stripMargin
  }
}
