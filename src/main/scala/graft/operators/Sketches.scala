package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** Sketch-based approximate aggregation — the cardinality shape a 100 TB
  * engine needs when exact distinct counts are too expensive: a distinct
  * count over N rows costs a shuffle of N keys, while a fixed-width sketch
  * costs a shuffle of at most `m` buckets per group, with map-side partial
  * merge, no matter how large N grows.
  *
  * The sketch here is linear (probabilistic) counting [Whang et al. 1990]:
  * hash every value into one of `m` buckets, count the buckets hit, estimate
  * n ~= -m * ln(1 - hits/m). Unlike HyperLogLog's leading-zero registers,
  * the bucket math is pure integer arithmetic on the shared 60-bit md5 hash
  * — bit-identical in any engine, so the driver oracle can verify the SKETCH
  * itself, not just a tolerance band (ln/round parity across Spark and
  * DuckDB is already load-bearing in the TF-IDF oracle).
  */
object Sketches {

  /** Bucket count: 1024 keeps the load factor low at test scale (n/m ~ 0.15,
    * standard error ~1%); a power of two so hits/m is exact in binary and
    * the ln argument cannot differ between engines.
    */
  val LinearCountBuckets = 1024L

  val LinearCountSalt = "lc:"

  /** Per-group approximate distinct count of `valueCol`:
    * (groupCols*, n_buckets_hit, est_distinct).
    *
    * Scale shape: the inner aggregation on (group, bucket) combines
    * map-side, so each mapper emits at most groups x m rows regardless of
    * input size; the outer per-group count is over at most m rows per
    * group. Two narrow shuffles of sketch-sized data — never a shuffle of
    * the raw value domain (the exact-countDistinct cost this replaces).
    */
  /** The shared value -> bucket map (salted 60-bit md5, mod m). */
  def bucketOf(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TF.hash60(concat(lit(LinearCountSalt), value.cast("string"))) % LinearCountBuckets

  /** n ~= -m * ln(1 - hits/m); null when the sketch is saturated (hits = m
    * would take ln(0) — surfaced as undefined rather than an arbitrary
    * number). Shared by the batch operator and the streaming twin so the
    * two can never disagree on the formula.
    *
    * Parity note: `round(ln(x), 6)` carries the known residual 1-ulp
    * cross-engine risk at a 6th-decimal half-way point (the TF-IDF oracle
    * ships the same shape and has stayed green at every sf). The argument
    * domain here is just the m+1 possible hit counts, and the SKETCH itself
    * is certified exactly through the integer `n_buckets_hit` — a spurious
    * est_distinct mismatch would implicate only this derived column.
    */
  def estimate(hits: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = LinearCountBuckets
    when(hits < m, round(log(lit(1.0) - hits / m.toDouble) * lit(-m.toDouble), 6))
  }

  def approxDistinct(df: DataFrame, valueCol: String, groupCols: String*): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ bucketOf(col(valueCol)).as("__bucket"): _*)
      .groupBy(g: _*).agg(countDistinct(col("__bucket")).as("n_buckets_hit"))
      .withColumn("est_distinct", estimate(col("n_buckets_hit")))
  }

  /** Driver query: approximate distinct users per event type. */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    approxDistinct(Tables.events(spark, dir), "user_id", "event_type")
      .orderBy(col("event_type"))
}

/** DuckDB oracle for [[Sketches]] — same salt, same bucket count, same
  * estimate formula.
  */
object SketchesSql {

  val approxDistinctUsersSql: String = {
    val m = Sketches.LinearCountBuckets
    val bucket =
      s"${TS.hash60(s"('${Sketches.LinearCountSalt}' || CAST(user_id AS VARCHAR))")} % $m"
    s"""WITH b AS (SELECT event_type, $bucket AS bucket FROM events),
       |h AS (SELECT event_type, count(DISTINCT bucket) AS n_buckets_hit
       |      FROM b GROUP BY 1)
       |SELECT event_type, n_buckets_hit,
       |  CASE WHEN n_buckets_hit < $m
       |    THEN round(-$m * ln(1.0 - n_buckets_hit / $m.0), 6)
       |  END AS est_distinct
       |FROM h ORDER BY event_type""".stripMargin
  }
}
