package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

import graft.operators.Sketches

/** The incremental linear-counting sketch on Spark 4's `transformWithState`
  * — the successor-state-API twin of [[StreamingSketch.counts]], the same
  * pairing [[TwsCdc]] gives [[StatefulCdc]]: typed per-key `ValueState`
  * handles and the RocksDB store as the execution substrate (the provider
  * `transformWithState` requires — and the one a 100 TB deployment runs,
  * since sketch-buffer state spills to disk and snapshots incrementally
  * instead of living on the executor heap).
  *
  * The update step is IDENTICAL to [[StreamingSketch.updateGroup]] — same
  * fixed 128-byte bitmask per group, same monotone cumulative-occupancy
  * emission — so certifying this form against the SAME batch oracle as
  * `q_approx_distinct` proves the sketch semantics carry across both state
  * APIs and both providers, now for the UPDATE-MODE aggregation class
  * rather than only the CDC path.
  */
object TwsSketch {

  class SketchProcessor extends StatefulProcessor[String, BucketHit, SketchCount] {
    @transient private var mask: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mask = getHandle.getValueState[Array[Byte]]("mask", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BucketHit],
        timers: TimerValues): Iterator[SketchCount] = {
      val m = if (mask.exists()) mask.get()
        else new Array[Byte]((Sketches.LinearCountBuckets / 8).toInt)
      rows.foreach { h =>
        m(h.bucket >> 3) = (m(h.bucket >> 3) | (1 << (h.bucket & 7))).toByte
      }
      mask.update(m)
      var hits = 0L
      var i = 0
      while (i < m.length) { hits += Integer.bitCount(m(i) & 0xff); i += 1 }
      Iterator.single(SketchCount(key, hits))
    }
  }

  def counts(hits: Dataset[BucketHit]): Dataset[SketchCount] =
    hits.groupByKey(_.event_type)(Encoders.STRING)
      .transformWithState(new SketchProcessor, TimeMode.None(),
        OutputMode.Update())(Encoders.product[SketchCount])

  /** Driver query: the same (event_type, n_buckets_hit, est_distinct) rows
    * as the batch `q_approx_distinct`, through the transformWithState
    * processor over distributed file-source micro-batches on the RocksDB
    * provider — SAME oracle, so the green row isolates exactly the state
    * API + provider swap against [[StreamingSketch]]'s fMGWS/default form.
    */
  def approxDistinctUsersFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    import spark.implicits._
    val emissions = TwsCdc.withRocksDb(spark) {
      ReplayHarness.emissionsFromFiles(
        spark, StreamingSketch.bucketHits(spark, dir), chunks,
        statePartitions = 4, prefix = "sketch_tws", outputMode = "update",
        col("event_type"), col("bucket"))(df => counts(df.as[BucketHit]).toDF())
    }
    StreamingSketch.foldEmissions(emissions)
  }
}
