package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Time-weighted semantics on a hand-built series: hold-duration
  * weighting (a long-held reading dominates a burst), per-series
  * isolation, and the open last interval excluded.
  */
class TimeWeightedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("a long-held reading outweighs a burst; the open tail is excluded") {
    // value 1.00 held 50 min, then three 10.00 readings 1 min apart
    val events = Seq(
      (1L, ts(0), 7L, "m", 1.0),
      (2L, ts(50), 7L, "m", 10.0),
      (3L, ts(51), 7L, "m", 10.0),
      (4L, ts(52), 7L, "m", 10.0) // open tail: no next event, excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeWeighted.perSeries(events)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, _, n, durMs, weighted) = got(0)
    assert(n == 3)
    assert(durMs == 52L * 60 * 1000)
    // 50 min @ 100 cents + 2 x 1 min @ 1000 cents
    assert(weighted == 50L * 60000 * 100 + 2L * 60000 * 1000)
    // the time-weighted mean (dominated by the held 1.00) vs plain mean
    assert(weighted.toDouble / durMs < 200, "burst over-weighted")
  }

  test("series are isolated by (user, type); single-event series drop out") {
    val events = Seq(
      (1L, ts(0), 7L, "a", 2.0), (2L, ts(10), 7L, "a", 2.0),
      (3L, ts(5), 7L, "b", 99.0), // single event in series (7,b)
      (4L, ts(0), 8L, "a", 5.0), (5L, ts(20), 8L, "a", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeWeighted.perSeries(events)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set((7L, "a"), (8L, "a")))
    assert(got((7L, "a"))._4 == 10L * 60000)
    assert(got((8L, "a"))._4 == 20L * 60000)
  }
}
