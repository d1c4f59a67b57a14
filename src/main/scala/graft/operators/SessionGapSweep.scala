package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Session-count sensitivity sweep over the inactivity-gap threshold —
  * the tuning curve behind [[Relational.sessionWindows]]'s 30-minute
  * knob: for each candidate gap G, how many sessions the corpus splits
  * into and the mean session length. An analytics owner reads this curve
  * before fixing the gap (too small fragments real visits, too large
  * merges distinct ones — the elbow is the signal), and the sweep prices
  * ALL thresholds from ONE pass: a session count at gap G is just
  * n_users + |inter-event gaps >= G|, so the per-user lag window runs
  * once and every threshold is a conditional count over the same delta
  * rows.
  *
  * The >= boundary is [[Relational.sessionWindows]]'s exact semantics
  * (an event at exactly session_end starts a new session), so the G=30
  * row of this sweep MUST equal that operator's session count —
  * SessionGapSweepSpec pins the reconciliation.
  *
  * Exactness: deltas are exact epoch-microsecond differences (NTZ cast
  * to the pinned-UTC session ≡ DuckDB epoch_us), thresholds are integer
  * microsecond literals, the mean is an integer ppm `div`.
  */
object SessionGapSweep {

  /** Candidate inactivity gaps, minutes; 30 is the certified operator's
    * pinned knob.
    */
  val GapsMinutes: Seq[Int] = Seq(5, 15, 30, 60, 120)

  /** (gap_minutes, n_sessions, n_users, events_per_session_ppm),
    * ordered by gap_minutes.
    */
  def sweepEvents(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    // (us, event_id) is the house total order (GapHistogram's rule); the
    // delta MULTISET is tie-order-invariant anyway, but determinism is
    // free
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    val deltas = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("__us"))
      .withColumn("__delta", col("__us") - lag(col("__us"), 1).over(w))
    val aggs = countDistinct(col("user_id")).as("n_users") ::
      count(lit(1)).as("n_events") ::
      GapsMinutes.map(g =>
        count(when(col("__delta") >= g.toLong * 60L * 1000000L, 1))
          .as(s"__splits_$g")).toList
    val oneRow = deltas.agg(aggs.head, aggs.tail: _*)
    oneRow
      .select(explode(array(GapsMinutes.map(g =>
        struct(lit(g).as("gap_minutes"),
          (col("n_users") + col(s"__splits_$g")).as("n_sessions"))): _*))
        .as("p"), col("n_users"), col("n_events"))
      .select(col("p.gap_minutes").as("gap_minutes"),
        col("p.n_sessions").as("n_sessions"), col("n_users"),
        // greatest(.., 1): an EMPTY events table still emits one global-agg
        // row (n_users = 0 -> n_sessions = 0), and Spark's non-ANSI div
        // yields null where DuckDB `//` raises — the same engine-divergence
        // class the Oversample zero-mass guard closes, guarded identically
        // in both spellings
        expr("(n_events * 1000000) div greatest(p.n_sessions, 1)")
          .as("events_per_session_ppm"))
      .orderBy(col("gap_minutes"))
  }
}

/** DuckDB oracle for [[SessionGapSweep]] — same lag deltas, same >=
  * boundary, same FILTER counts per threshold.
  */
object SessionGapSweepSql {
  import SessionGapSweep.GapsMinutes

  val sweepEventsSql: String = {
    val splitCols = GapsMinutes.map(g =>
      s"count(*) FILTER (WHERE delta >= ${g.toLong * 60L * 1000000L}) " +
        s"AS splits_$g").mkString(",\n|    ")
    val perGap = GapsMinutes.map(g =>
      s"SELECT $g AS gap_minutes, n_users + splits_$g AS n_sessions, " +
        s"n_users, (n_events * 1000000) // greatest(n_users + splits_$g, 1) " +
        s"AS events_per_session_ppm FROM s").mkString("\nUNION ALL\n")
    s"""WITH d AS (
       |  SELECT user_id,
       |    epoch_us(ts) - lag(epoch_us(ts)) OVER
       |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS delta
       |  FROM events),
       |s AS (
       |  SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       |    $splitCols
       |  FROM d)
       |$perGap
       |ORDER BY gap_minutes""".stripMargin
  }
}
