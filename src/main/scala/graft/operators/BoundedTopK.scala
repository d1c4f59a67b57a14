package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS, TopKAgg}
import graft.sources.Tables

/** Top-k per group WITHOUT a global sort: the [[graft.functions.TopKAgg]]
  * bounded aggregate, demonstrated against the same ranking the window
  * queries ([[Relational.windowTop3]], [[Relational.topKOrders]]) compute
  * with `row_number()`.
  *
  * Plan shape: one hash-aggregate pair (partial in the scan stage, final
  * after a group-key exchange whose payload is O(k) per group per mapper),
  * then a narrow posexplode. The window form's exchange carries the whole
  * fact table and sorts it; this one carries bounded buffers. The oracle is
  * the window form in DuckDB — proving bounded-merge top-k ≡ sort top-k.
  */
object BoundedTopK {

  /** Driver query: top 5 orders by price within each order priority,
    * ranked (cents DESC, o_orderkey ASC). Prices fold to integer cents
    * before ranking (the repo's exactness discipline) and unfold for
    * display — cents < 2^53, so `cents / 100.0` is exact in both engines.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(TopKAgg.agg(col("cents"), col("o_orderkey"), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("o_orderkey"),
        (col("col.value").cast("double") / 100.0).as("total_price"))
      .orderBy(col("o_orderpriority"), col("rank"))

  /** Exact sample size per group for [[sampleDocsPerLang]]. */
  val SampleK = 20

  /** Salt distinguishing this sampler's hash from the split hash
    * ([[TextAnalysis.splitAssign]]), the stratified-sample hash
    * ([[TextAnalysis.SampleSalt]]), and the mixture coin ([[Mixture.Salt]])
    * — each decision must be independent of the others.
    */
  val KSampleSalt = "ksample:"

  /** Deterministic EXACT-k-per-group sampling — the missing sibling of the
    * rate-based samplers ([[TextAnalysis]] stratified sampling keeps
    * rate x n documents; [[Mixture.rebalance]] hits a token share): keep
    * exactly [[SampleK]] documents per language, chosen content-addressed
    * (the k smallest salted 60-bit hashes of doc_id), so the sample is
    * reproducible across runs, engines, and cluster sizes, and STABLE
    * under corpus growth — a document leaves the sample only when a
    * smaller-hash newcomer displaces it, never because partitioning moved.
    *
    * Scale shape: the naive spelling is `row_number() OVER (PARTITION BY
    * lang ORDER BY hash)` — a full shuffle AND sort of the corpus to
    * discard all but k rows per group. This form reuses the bounded
    * [[TopKAgg]] aggregate (hash-ascending = value-descending on the
    * negated 60-bit hash, which cannot overflow): O(k) buffers map-side,
    * the exchange carries kilobytes, nothing is globally sorted — the same
    * bounded-merge-equals-sort guarantee the oracle proves, now doing
    * uniform sampling work. This is how "pick 10k docs per domain for
    * eval" should run at 100 TB.
    */
  def sampleDocsPerLang(spark: SparkSession, dir: String): DataFrame = {
    val h = TF.hash60(concat(lit(KSampleSalt), col("doc_id").cast("string")))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"), h.as("h"))
      .groupBy(col("lang"))
      .agg(TopKAgg.agg(-col("h"), col("doc_id"), SampleK).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), (-col("col.value")).as("h"))
      .orderBy(col("lang"), col("rank"))
  }

  val sampleDocsPerLangSql: String = {
    val h = TS.hash60(s"'$KSampleSalt' || CAST(doc_id AS VARCHAR)")
    s"""WITH hashed AS (
       |  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, $h AS h
       |  FROM documents),
       |ranked AS (
       |  SELECT lang, doc_id, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
       |  FROM hashed)
       |SELECT lang, CAST(rnk AS INT) AS rank, doc_id, h
       |FROM ranked WHERE rnk <= $SampleK
       |ORDER BY lang, rank""".stripMargin
  }

  val topOrdersPerPrioritySql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
      |               o_orderkey) AS rnk
      |  FROM orders)
      |SELECT o_orderpriority, CAST(rnk AS INT) AS rank, o_orderkey,
      |  CAST(cents AS DOUBLE) / 100.0 AS total_price
      |FROM ranked WHERE rnk <= 5
      |ORDER BY o_orderpriority, rank""".stripMargin
}
