package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.operators.HeavyHitters
import graft.sources.Tables

/** The bounded Misra-Gries heavy-hitter counters on `transformWithState`
  * with `MapState` — the fourth successor-API port, and the one that
  * exercises the LAST typed state primitive ([[TwsCdc]]/[[TwsSketch]] use
  * `ValueState`, [[TwsSessions]] `ListState` + timers; this adds
  * `MapState`, so every state shape the new API offers is now certified
  * against a DuckDB oracle).
  *
  * `MapState` is not cosmetic here — it is the at-scale representation for
  * per-key sub-maps: the fMGWS form ([[StreamingBoundedHeavyHitters]])
  * must deserialize and re-serialize the ENTIRE counter map as one state
  * value every micro-batch (write amplification O(capacity) per group per
  * batch), where `MapState` on RocksDB stores each counter as its own
  * store entry and the write-back below touches only the counters the
  * batch CHANGED — O(touched + evicted) point updates, the difference
  * between rewriting a 64 Ki-entry blob and upserting the handful of keys
  * a batch actually moved.
  *
  * The fold step is [[HeavyHitters.mgFold]] verbatim (same counters, same
  * decrement-all-at-capacity step), the emission contract is
  * [[StreamingBoundedHeavyHitters]]'s ([[MgGroupEmit]] summaries stamped
  * with rows-seen), and the certification oracle is the SAME exact batch
  * profile — so the green row isolates exactly the state API + layout
  * swap.
  */
object TwsHeavyHitters {

  class MgProcessor(capacity: Int)
      extends StatefulProcessor[Int, Long, MgGroupEmit] {
    @transient private var counters: MapState[Long, Long] = _
    @transient private var seenState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[Long, Long]("counters",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      seenState = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(gid: Int, rows: Iterator[Long],
        timers: TimerValues): Iterator[MgGroupEmit] = {
      val local = mutable.LongMap.empty[Long]
      counters.iterator().foreach { case (k, v) => local(k) = v }
      val before = local.clone()
      val n = HeavyHitters.mgFold(local, capacity, rows)
      val seen = (if (seenState.exists()) seenState.get() else 0L) + n
      seenState.update(seen)
      // point write-back: only counters the fold changed touch the store
      before.keysIterator.filterNot(local.contains).foreach(counters.removeKey)
      local.foreach { case (k, v) =>
        if (!before.get(k).contains(v)) counters.updateValue(k, v)
      }
      local.iterator.map { case (k, c) => MgGroupEmit(gid, Some(k), c, seen) } ++
        Iterator.single(MgGroupEmit(gid, None, seen, seen))
    }
  }

  /** Same contract as [[StreamingBoundedHeavyHitters.summaryStream]]: keys
    * hash into `groups` stateful groups; each batch emits the group's
    * current bounded summary stamped with its rows-seen total.
    */
  def summaryStream(keys: Dataset[Long], groups: Int,
      capacity: Int): Dataset[MgGroupEmit] = {
    require(groups >= 1 && capacity >= 1,
      s"groups=$groups capacity=$capacity must be >= 1")
    keys
      .groupByKey(k =>
        Math.floorMod(scala.util.hashing.byteswap64(k), groups.toLong).toInt)(
        Encoders.scalaInt)
      .transformWithState(new MgProcessor(capacity), TimeMode.None(),
        OutputMode.Append())(Encoders.product[MgGroupEmit])
  }

  /** Driver query: the same top-10 hot customer keys as the exact batch
    * `q_heavy_hitters`, through the MapState Misra-Gries processor over
    * distributed file-source micro-batches on the RocksDB provider — SAME
    * oracle and fold as the fMGWS twins, so the green row isolates the
    * state API + layout swap.
    */
  def hotCustomersFromFiles(spark: SparkSession, dir: String, chunks: Int = 3,
      groups: Int = 8, capacity: Int = 1 << 16): DataFrame = {
    import spark.implicits._
    val staged = Tables.orders(spark, dir).select(col("o_custkey"))
    val emissions = TwsCdc.withRocksDb(spark) {
      ReplayHarness.emissionsFromFiles(
        spark, staged, chunks, statePartitions = 8,
        prefix = "hh_bounded_tws", outputMode = "append", col("o_custkey"))(
        df => summaryStream(df.as[Long], groups, capacity).toDF())
    }
    StreamingBoundedHeavyHitters.foldEmissions(emissions)
  }
}
