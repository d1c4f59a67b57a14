package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One open (not-yet-finalized) session in per-user state: the closed
  * interval of observed event times in MICROSECONDS plus the event count.
  * The would-be session end is `last_us + gap` (exclusive), matching
  * `session_window`. Micros, not a `Timestamp`: the parquet event times
  * carry microsecond precision, and a `Timestamp.getTime` round-trip
  * truncates to milliseconds — the state math stays on the exact i64
  * `unix_micros` value end-to-end.
  */
final case class OpenSession(start_us: Long, last_us: Long, n: Long)

/** One replayed event entering the timer-driven sessionizer: the original
  * event-time column (carried so the watermark survives into the stateful
  * operator) plus its exact `unix_micros` value for state math.
  */
final case class EventAtMicros(ts: java.sql.Timestamp, us: Long, user_id: Long)

/** One finalized session leaving the processor, in exact micros; converted
  * back with `timestamp_micros` in the output projection.
  */
final case class SessionAtMicros(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

/** Gap sessionization hand-rolled on Spark 4's `transformWithState` with
  * EVENT-TIME TIMERS — the merging-window class on the successor state
  * API, completing the certificate matrix whose CDC ([[TwsCdc]]) and
  * update-mode ([[TwsSketch]]) rows landed earlier: every stateful class
  * the engine ships now runs on BOTH state APIs (fMGWS / built-in
  * `session_window` vs `transformWithState`) and BOTH store providers
  * (HDFS-backed default vs RocksDB), certified against the same DuckDB
  * oracles.
  *
  * Unlike the CDC and sketch rows — whose update steps port verbatim —
  * the merging-window class exercises what is genuinely NEW in the
  * successor API: `ListState` (one entry per open session, so state is
  * O(open sessions per user), never O(events)) and per-key event-time
  * timers (`registerTimer` at each session's would-be end; the timer
  * fires once the watermark passes it, and [[SessionProcessor
  * .handleExpiredTimer]] emits exactly the sessions whose end the
  * watermark has passed — the eviction `session_window` performs
  * internally, made explicit). Two open sessions coalesce when an event
  * bridges them to within the gap. Exactly ONE timer is armed per key —
  * at the EARLIEST open end — and re-armed on expiry for the next open
  * session: arming per session would leave every extension's superseded
  * timer in the store (O(events) timer entries and fired callbacks, each
  * a state round-trip), where the single-timer discipline keeps the timer
  * registry O(keys) and fires O(finalizations) callbacks. Firing is
  * driven by the watermark against STATE (`last + gap <= wm`), never by
  * the timer's own value, so a timer superseded mid-batch stays harmless.
  * Timers are millisecond-resolution while event times are micros, so
  * registration rounds UP to the next whole ms (a timer must never fire
  * before its session's true end).
  *
  * Boundary semantics match `session_window` and the batch oracle
  * exactly: a session's end is EXCLUSIVE (`last + gap`), so an event at
  * exactly `last + gap` starts a new session (the oracle's
  * `ts - lag(ts) >= INTERVAL 30 MINUTE` new-session mark,
  * `Relational.sessionWindowsSql`) and two sessions merge only when
  * strictly closer than the gap.
  *
  * At 100 TB: state hash-partitions by user across executors on the
  * RocksDB store (disk-spilling, incremental snapshots); per-key work is
  * O(open + batch-events log) per micro-batch; timers are the mechanism
  * that bounds state under unbounded ingest — every finalized session
  * leaves the store the micro-batch its timer fires.
  */
object TwsSessions {

  /** 30-minute gap / exclusive end, as the batch `q_session_windows`. */
  val GapUs: Long = 30L * 60 * 1000000

  /** Coalesce open sessions and new event times into the merged open-session
    * set: every maximal run of points pairwise bridgeable within the gap
    * (strictly: successor start < predecessor last + gap) is one session.
    * Pure, unit-agnostic, and order-insensitive — certified directly by
    * spec, then end-to-end by the oracle.
    */
  def merge(existing: Seq[OpenSession], eventUs: Seq[Long],
      gapUs: Long): Seq[OpenSession] = {
    val all = (existing ++ eventUs.map(t => OpenSession(t, t, 1L)))
      .sortBy(s => (s.start_us, s.last_us))
    val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    all.foreach { s =>
      if (out.nonEmpty && s.start_us < out.last.last_us + gapUs) {
        val p = out.remove(out.length - 1)
        out += OpenSession(p.start_us, math.max(p.last_us, s.last_us), p.n + s.n)
      } else out += s
    }
    out.toSeq
  }

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, EventAtMicros, SessionAtMicros] {
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    /** Keep exactly one armed timer: the earliest open end, rounded UP to
      * timer (ms) resolution. No-op when already armed there.
      */
    private def rearm(sessions: Seq[OpenSession]): Unit = {
      val current = getHandle.listTimers().toSeq
      if (sessions.isEmpty) { current.foreach(getHandle.deleteTimer); return }
      val next = (sessions.map(_.last_us).min + gapUs + 999) / 1000
      if (current != Seq(next)) {
        current.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(next)
      }
    }

    override def handleInputRows(user: Long, rows: Iterator[EventAtMicros],
        timers: TimerValues): Iterator[SessionAtMicros] = {
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      val merged = merge(existing, rows.map(_.us).toSeq, gapUs)
      open.put(merged.toArray)
      rearm(merged)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionAtMicros] = {
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      val wmUs = timers.getCurrentWatermarkInMs() * 1000
      val (done, still) = existing.partition(s => s.last_us + gapUs <= wmUs)
      if (still.isEmpty) open.clear() else open.put(still.toArray)
      rearm(still)
      done.iterator.map(s =>
        SessionAtMicros(user, s.start_us, s.last_us + gapUs, s.n))
    }
  }

  /** Finalized sessions of an event stream with event-time column `ts`,
    * keyed by `user_id` — same contract as [[StreamingSessions.sessions]],
    * different machinery underneath. The watermarked `ts` column rides
    * along into the processor input so `TimeMode.EventTime` sees it; the
    * state math uses the exact `unix_micros` twin.
    */
  def sessions(events: DataFrame, gapUs: Long = GapUs,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("ts"), unix_micros(col("ts")).as("us"), col("user_id"))
      .as[EventAtMicros]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime(),
        OutputMode.Append())(Encoders.product[SessionAtMicros])
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"))
  }

  /** Driver query: the same finalized-session rows as the batch
    * `q_session_windows`, through the timer-driven processor over
    * distributed file-source micro-batches on the RocksDB provider —
    * staged, sentinel-flushed, and read back by the SAME
    * [[FileReplaySessions]] harness as the `session_window` twin, so the
    * two rows differ only in the operator under test.
    */
  def userSessionsFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    TwsCdc.withRocksDb(spark) {
      FileReplaySessions.run(spark, dir, chunks, stream => sessions(stream))
    }
  }
}
