package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** M4 time-series downsampling — the error-free line-chart reduction
  * (public: Jugel et al., "M4: A Visualization-Oriented Time Series Data
  * Aggregation", VLDB 2014): per (series, pixel bucket), keep exactly
  * the four points a pixel-perfect line rendering needs — first, last,
  * value-min, value-max. A dashboard fetches W buckets instead of the
  * raw stream; the drawn polyline is IDENTICAL to rendering every point.
  *
  * Buckets are a FIXED wall-clock grid ([[BucketMicros]]-wide, epoch
  * `div`) rather than a span-relative one: no global min/max pass, the
  * grid is stable as data arrives, and bucket ids are reproducible
  * across engines with pure integer division on non-negative epochs.
  *
  * Scale shape: ONE map-side-combined aggregation — every extreme is a
  * partially-aggregatable struct min/max (lexicographic), so each
  * partition contributes one candidate tuple per live bucket and the
  * shuffle carries bucket-cardinality rows regardless of stream size.
  * The struct orderings double as the determinism contract: ties on
  * value break on (us, event_id), ties on time on event_id — mirrored
  * by the oracle's window orderings.
  *
  * Exactness: timestamps as epoch micros (NTZ→LTZ cast under the pinned
  * UTC session ≡ DuckDB `epoch_us` on the naive value); values as
  * floor-cents longs.
  */
object M4Downsample {

  /** Pixel width: 6 h of micros — ~120 buckets over the fixture month. */
  val BucketMicros = 21600000000L

  /** The bucketed struct-extreme aggregation (struct columns unflattened)
    * — shared with [[graft.streaming.StreamingM4]], where it runs
    * unchanged as an update-mode streaming aggregation: every running
    * extreme is MONOTONE under its struct order (mins only decrease,
    * maxes only increase, counts only grow), so the twin's readback fold
    * is the same min/max over emissions.
    */
  private[graft] def aggregated(events: DataFrame): DataFrame = {
    val pts = events.select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        floor(col("value") * 100).cast("long").as("v_cents"))
      .withColumn("bucket", expr(s"us div $BucketMicros"))
    pts.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_points"),
        min(struct(col("us"), col("event_id"), col("v_cents"))).as("__f"),
        max(struct(col("us"), col("event_id"), col("v_cents"))).as("__l"),
        min(struct(col("v_cents"), col("us"), col("event_id"))).as("__mn"),
        max(struct(col("v_cents"), col("us"), col("event_id"))).as("__mx"))
  }

  /** The presentation projection over [[aggregated]]'s struct columns —
    * the twin applies it after its fold, so both forms share one tail.
    */
  private[graft] def flatten(agg: DataFrame): DataFrame =
    agg.select(col("event_type"), col("bucket"), col("n_points"),
        col("__f.us").as("first_us"), col("__f.v_cents").as("first_cents"),
        col("__l.us").as("last_us"), col("__l.v_cents").as("last_cents"),
        col("__mn.us").as("min_us"), col("__mn.v_cents").as("min_cents"),
        col("__mx.us").as("max_us"), col("__mx.v_cents").as("max_cents"))
      .orderBy(col("event_type"), col("bucket"))

  /** (event_type, bucket, n_points, first/last/min/max point pairs). */
  def downsample(events: DataFrame): DataFrame =
    flatten(aggregated(events))

  /** Driver query: the M4 reduction of the events stream. */
  def downsampleEvents(spark: SparkSession, dir: String): DataFrame =
    downsample(Tables.events(spark, dir))
}

/** DuckDB oracle for [[M4Downsample]] — the window spelling of the same
  * four extremes with the same lexicographic tie orders.
  */
object M4DownsampleSql {

  val downsampleEventsSql: String =
    s"""WITH pts AS (
       |  SELECT event_type, epoch_us(ts) AS us, event_id,
       |    CAST(floor(value * 100) AS BIGINT) AS v_cents,
       |    epoch_us(ts) // ${M4Downsample.BucketMicros} AS bucket
       |  FROM events),
       |r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY us, event_id) AS rf,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY us DESC, event_id DESC) AS rl,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY v_cents, us, event_id) AS rmn,
       |    row_number() OVER (PARTITION BY event_type, bucket
       |      ORDER BY v_cents DESC, us DESC, event_id DESC) AS rmx
       |  FROM pts)
       |SELECT event_type, bucket, count(*) AS n_points,
       |  CAST(max(CASE WHEN rf = 1 THEN us END) AS BIGINT) AS first_us,
       |  CAST(max(CASE WHEN rf = 1 THEN v_cents END) AS BIGINT) AS first_cents,
       |  CAST(max(CASE WHEN rl = 1 THEN us END) AS BIGINT) AS last_us,
       |  CAST(max(CASE WHEN rl = 1 THEN v_cents END) AS BIGINT) AS last_cents,
       |  CAST(max(CASE WHEN rmn = 1 THEN us END) AS BIGINT) AS min_us,
       |  CAST(max(CASE WHEN rmn = 1 THEN v_cents END) AS BIGINT) AS min_cents,
       |  CAST(max(CASE WHEN rmx = 1 THEN us END) AS BIGINT) AS max_us,
       |  CAST(max(CASE WHEN rmx = 1 THEN v_cents END) AS BIGINT) AS max_cents
       |FROM r
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin
}
