package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.sources.Tables

/** One keyed observation entering the streaming counter. */
final case class KeyHit(k: Long)

/** Streaming twin of [[HeavyHitters.topKeys]]: per-key counters maintained
  * incrementally as a plain update-mode streaming `groupBy(key).count()` —
  * built-in incremental aggregation, like [[StreamingQuantiles]] — with the
  * ranking/share tail ([[HeavyHitters.rankCounts]]) over the final
  * counters, against the SAME oracle as the batch form.
  *
  * Scale: state is one counter per DISTINCT key — exact heavy-hitters is
  * keyspace-bounded by nature (the batch form's shuffle carries the same
  * cardinality). When the key universe itself overwhelms memory, the
  * bounded-state path is a Misra-Gries/count-min sketch in
  * mapGroupsWithState ([[StreamingSketch]]'s shape) at the cost of
  * approximation; the exact form is the oracle-verifiable contract.
  * Update-mode emissions are cumulative counts, monotone nondecreasing, so
  * the final counter set is the per-key row max, batch-order-independent.
  */
object StreamingHeavyHitters {

  /** Driver query: the same top-10 hot customer keys as the batch
    * `q_heavy_hitters`, produced by streaming the orders fact table through
    * the incremental counters in `chunks` micro-batches. The MemoryStream
    * feed is the single-endpoint ingest seam (the Replay pattern).
    */
  def hotCustomers(spark: SparkSession, dir: String, chunks: Int = 3): DataFrame = {
    import spark.implicits._
    val rows = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k")).as[KeyHit].collect()
    val emissions = ReplayHarness.updateModeEmissions(
      spark, rows.toIndexedSeq, chunks, statePartitions = 8, prefix = "hh_stream")(
      _.groupBy(col("k")).count())
    // cumulative counts are monotone: the final counter is the row max
    val counts = emissions
      .groupBy(col("k").as("o_custkey"))
      .agg(max(col("count")).as("n_rows"))
    HeavyHitters.rankCounts(counts, "o_custkey", 10)
  }
}
