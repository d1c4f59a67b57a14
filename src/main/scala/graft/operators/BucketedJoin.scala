package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{StorageLayout, Tables}

/** The bucketed-layout join as a DRIVER-CERTIFIED operator: orders and
  * customer are rewritten once as same-bucket-count tables clustered on
  * their join key ([[StorageLayout.writeBucketed]]), then joined with NO
  * exchange on either side — the write-time-shuffle-instead-of-query-time-
  * shuffle contract that [[graft.sources.StorageLayoutSpec]] pins on the
  * plan, here certified end-to-end on the driver tables against the plain
  * parquet-join oracle (the layout must change the PLAN, never the ANSWER).
  *
  * Scale shape: at 100 TB the fact-to-fact shuffle is the dominant cost of
  * every repeated join on the same key; bucketing pays it once at write
  * time and every downstream query joins exchange-free on bucket-aligned
  * scans. The broadcast threshold is disabled around the join so the
  * certified shape is the sort-merge big-big form (a broadcast would mask
  * the layout at toy scale); the single remaining exchange in the plan is
  * the segment-cardinality aggregation above the join.
  *
  * Money math follows the repo's exactness rule: cent-scaled longs, never
  * a double sum (the [[SaltedJoin]] spelling).
  */
object BucketedJoin {

  val Buckets = 8

  /** Driver query: per-segment order volume through the bucketed layout.
    * Writes the two bucketed tables into a run-scoped temp warehouse dir,
    * joins them exchange-free, and aggregates; tables and files are
    * dropped on all paths.
    */
  def orderVolumeBySegment(spark: SparkSession, dir: String): DataFrame = {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val work = java.nio.file.Files.createTempDirectory("graft_bucketed").toFile
    val ordersTable = s"graft_bk_orders_$run"
    val custTable = s"graft_bk_customer_$run"
    try {
      StorageLayout.writeBucketed(
        Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice")),
        ordersTable, s"${work.getAbsolutePath}/orders", "o_custkey", Buckets)
      StorageLayout.writeBucketed(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
        custTable, s"${work.getAbsolutePath}/customer", "c_custkey", Buckets)
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val joined = try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.table(ordersTable)
          .join(spark.table(custTable),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))
          .orderBy(col("c_mktsegment"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // materialize before the finally-block drops the tables under the plan
      val rows = joined.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), joined.schema)
        .orderBy(col("c_mktsegment"))
    } finally {
      try spark.sql(s"DROP TABLE IF EXISTS $ordersTable") catch { case _: Exception => () }
      try spark.sql(s"DROP TABLE IF EXISTS $custTable") catch { case _: Exception => () }
      org.apache.commons.io.FileUtils.deleteQuietly(work)
    }
  }

  /** The exchange-free joined frame over already-bucketed tables —
    * separated so the spec can pin the plan shape on the REAL driver
    * tables (no Exchange below the join).
    */
  def joinBucketed(spark: SparkSession, ordersTable: String,
      custTable: String): DataFrame =
    spark.table(ordersTable)
      .join(spark.table(custTable), col("o_custkey") === col("c_custkey"))

  /** DuckDB mirror: the plain parquet join — the layout must not change
    * the answer.
    */
  val orderVolumeBySegmentSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |         AS total_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
