package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState,
  TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.operators.{MqttPipeline, MqttQueries}

/** One bootstrapped per-topic state row: the last payload the batch
  * backfill saw for the topic.
  */
final case class TopicLast(topic: String, value: Array[Byte])

/** The BACKFILL-TO-STREAMING HANDOFF on `transformWithState`'s initial
  * state: the operational move every stateful deployment eventually needs —
  * history up to a cut point T already processed as a batch backfill, the
  * stream starts at T, and the stream's state is BOOTSTRAPPED from the
  * backfill's final snapshot instead of replaying the past
  * (`StatefulProcessorWithInitialState.handleInitialState`, delivered
  * per key in the first micro-batch).
  *
  * Why it matters at 100 TB: without initial state, "start the CDC stream"
  * means replaying the entire retained history through the state machine
  * just to rebuild last-payloads — O(history) ingest before the first live
  * message. With it, the stream starts O(topics) cold: the batch engine
  * (which is better at bulk) computes the snapshot, the stream picks up
  * from there.
  *
  * The correctness contract is exact, not approximate: batch CDC over the
  * head, plus the stream over the tail with bootstrapped state, must equal
  * full-history CDC — including SUPPRESSING a tail message whose payload
  * equals the head's last (the case that distinguishes a real handoff from
  * a fresh-state restart, present in the fixture at both gate scales).
  * Certified against the SAME DuckDB oracle as `mqtt_history` — the oracle
  * never sees the cut, so any bootstrap defect (missed, duplicated, or
  * fresh state) surfaces as a row diff.
  *
  * The cut itself is arbitrary by design (production cuts at "when the
  * backfill ran"); the driver form cuts at the 0.7 count-quantile of
  * arrival order, where both gate scales have boundary-duplicate pairs
  * (sf0.001: 1, sf0.01: 4 — measured over the excluded replay frame; the
  * spec asserts this non-vacuity from the implementation's own cut).
  */
object TwsBootstrapCdc {

  class BootstrapCdcProcessor
      extends StatefulProcessorWithInitialState[String, MqttMsg, CdcEvent, TopicLast] {
    @transient private var last: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Array[Byte]]("last", Encoders.BINARY,
        TTLConfig.NONE)

    override def handleInitialState(topic: String, s: TopicLast,
        timers: TimerValues): Unit =
      last.update(s.value)

    override def handleInputRows(topic: String, rows: Iterator[MqttMsg],
        timers: TimerValues): Iterator[CdcEvent] =
      TwsCdc.foldTopic(last, topic, rows)
  }

  /** CDC over `msgs` with per-topic state bootstrapped from `snapshot` —
    * the same update step as [[TwsCdc.changes]], plus `handleInitialState`.
    */
  def changesFrom(msgs: Dataset[MqttMsg],
      snapshot: Dataset[TopicLast]): Dataset[CdcEvent] =
    msgs.groupByKey(_.topic)(Encoders.STRING)
      .transformWithState(new BootstrapCdcProcessor, TimeMode.None(),
        OutputMode.Append(),
        snapshot.groupByKey(_.topic)(Encoders.STRING))(
        Encoders.product[CdcEvent], Encoders.product[TopicLast])

  /** The cut timestamp: the arrival-order `frac` count-quantile of `m`
    * (exact — sort-limit-max; the cut is a harness choice, production cuts
    * at the backfill wall-clock instead). Returns null on an empty frame.
    */
  private[streaming] def cutAt(m: DataFrame, frac: Double): Any = {
    val n = m.count()
    if (n == 0L) return null
    val k = math.max(1L, (n * frac).toLong)
    m.orderBy(col("ts"), col("msg_id")).limit(k.toInt)
      .agg(max(col("ts"))).head().get(0)
  }

  /** The head's final state: last payload per topic in (ts, msg_id) order —
    * one map-side-combined aggregation, O(topics) rows out.
    */
  private[streaming] def snapshotOf(head: DataFrame): DataFrame =
    head.groupBy(col("topic"))
      .agg(max_by(col("value"), struct(col("ts"), col("msg_id"))).as("value"))

  /** Driver query: the full `mqtt_history` rows, computed as batch CDC over
    * the head PLUS the bootstrapped stream over the tail (distributed
    * file-source micro-batches, RocksDB provider), finished by the shared
    * id-assignment + dimension join — SAME oracle as `mqtt_history`.
    */
  def history(spark: SparkSession, dir: String, chunks: Int = 3,
      frac: Double = 0.7): DataFrame = {
    import spark.implicits._
    val m = MqttQueries.replayMessages(spark, dir)
    val t = cutAt(m, frac)
    if (t == null) return MqttQueries.history(spark, dir) // empty: no cut
    val head = m.filter(col("ts") <= lit(t))
    val tail = m.filter(col("ts") > lit(t))
    val headKept = MqttPipeline.historyKept(head)
    val snapshot = snapshotOf(head).as[TopicLast]

    val work = java.nio.file.Files.createTempDirectory("graft_handoff").toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      val staged = tail.select(col("msg_id"),
        col("ts").cast("timestamp").as("ts"),
        col("topic"), col("value"), col("qos"), col("retain"))
      FileStage.stage(staged, inDir, chunks, col("ts"), col("msg_id"))
      val outDir = new java.io.File(work, "out").getAbsolutePath
      val ckDir = new java.io.File(work, "ck").getAbsolutePath
      var schema: org.apache.spark.sql.types.StructType = null
      // noDataBatches off: the bootstrap processor runs TimeMode.None (no
      // timers) and emits on arrival — the trailing no-data batch would be
      // pure RocksDB-commit cost. File-sink readback (r22): CDC emissions
      // are change-cardinality, so they ride a distributed parquet sink,
      // never the driver-resident memory sink.
      val q = TwsCdc.withRocksDb(spark) {
        ReplayHarness.runWithStatePartitions(spark, 8, noDataBatches = false) {
          val stream = spark.readStream
            .schema(staged.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inDir)
          val cdc = changesFrom(stream.as[MqttMsg], snapshot)
          schema = cdc.schema
          cdc
            .writeStream.format("parquet")
            .option("path", outDir).option("checkpointLocation", ckDir)
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
        }
      }
      try q.awaitTermination() finally q.stop()
      val streamedKept = ReplayHarness.pinnedParquet(spark, schema, outDir)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .select(col("ts"), col("topic"), col("value"), col("msg_id"))
      MqttQueries.finishHistory(headKept.unionByName(streamedKept), m)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
