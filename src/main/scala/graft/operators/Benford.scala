package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Benford first-digit audit — the classic forensic screen on a money
  * column: the distribution of leading significant digits against
  * Benford's law. Fabricated or capped values bend the curve; this
  * report is the one-pass detector auditors run first.
  *
  * Exactness: the digit is the first character of the integer part's
  * decimal rendering, guarded by a `>= 1` filter IN BOTH SPELLINGS so
  * the extraction is well-defined by construction — negative totals
  * would render '-' and sub-1 totals '0'; the corpus invariant
  * (o_totalprice ≥ 800 everywhere) makes the filter a no-op today, but
  * a corpus change now shrinks the audited population instead of
  * silently minting a null/'0' digit bucket. Pure string/integer ops
  * after the guard; observed shares are ppm
  * `div`; the Benford expectation `floor(1e6·log10(1+1/d))` is computed
  * ONCE in Scala and inlined as the same literal into both engines'
  * spellings, so no runtime log crosses an engine boundary.
  *
  * Scale shape: one narrow scan, ONE map-side-combined fold to 9 rows,
  * the total as a window over the 9-row result.
  */
object Benford {

  /** floor(1e6·log10(1 + 1/d)) for d = 1..9 — shared literals. */
  val ExpectedPpm: Seq[Long] =
    (1 to 9).map(d => math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /** (digit, n, ppm, benford_ppm, dev_ppm) for digits 1-9. */
  def report(orders: DataFrame): DataFrame = {
    val expected = ExpectedPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
      .mkString("CASE digit ", " ", " ELSE 0L END")
    orders
      .filter(col("o_totalprice") >= 1)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("__total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div __total").as("ppm"),
        expr(expected).as("benford_ppm"))
      .withColumn("dev_ppm", col("ppm") - col("benford_ppm"))
      .orderBy(col("digit"))
  }

  /** Driver query: the first-digit audit of order totals. */
  def reportOrders(spark: SparkSession, dir: String): DataFrame =
    report(Tables.orders(spark, dir))
}

/** DuckDB oracle for [[Benford]] — same digit extraction, the SAME
  * Scala-computed expectation literals.
  */
object BenfordSql {

  val reportOrdersSql: String = {
    val expected = Benford.ExpectedPpm.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }
      .mkString("CASE digit ", " ", " ELSE 0 END")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders WHERE o_totalprice >= 1),
       |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
       |SELECT digit, n,
       |  (n * 1000000) // CAST(sum(n) OVER () AS BIGINT) AS ppm,
       |  $expected AS benford_ppm,
       |  (n * 1000000) // CAST(sum(n) OVER () AS BIGINT) -
       |    ($expected) AS dev_ppm
       |FROM c ORDER BY digit""".stripMargin
  }
}
