package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Attribution semantics: endpoint selection under the (ts, event_id)
  * total order, single-event users, and transition-share normalization.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("first/last endpoints follow the total order; a single event is both") {
    val events = Seq(
      (2L, ts(0), 7L, "signup", 0.0),   // same ts as event 1: id breaks tie
      (1L, ts(0), 7L, "view", 0.0),
      (3L, ts(5), 7L, "purchase", 0.0),
      (4L, ts(9), 9L, "view", 0.0)      // single-event user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Attribution.firstLastTouch(events)
      .as[(Long, Long, String, Timestamp, String, Timestamp)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(7L)._3 == "view" && got(7L)._5 == "purchase" && got(7L)._2 == 3)
    assert(got(9L)._3 == "view" && got(9L)._5 == "view" && got(9L)._2 == 1)
  }

  test("transition shares are per-row ppm and rows sum to <= 1e6") {
    val events = Seq(
      (1L, ts(0), 7L, "a", 0.0), (2L, ts(1), 7L, "b", 0.0),
      (3L, ts(2), 7L, "a", 0.0), (4L, ts(3), 7L, "c", 0.0),
      (5L, ts(0), 8L, "a", 0.0), (6L, ts(1), 8L, "b", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Attribution.transitions(events)
      .as[(String, String, Long, Long)].collect()
    val m = got.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // from a: 2x a->b, 1x a->c (user 7: a->b, a->c; user 8: a->b)
    assert(m(("a", "b")) == ((2L, 666666L)))
    assert(m(("a", "c")) == ((1L, 333333L)))
    assert(m(("b", "a")) == ((1L, 1000000L)))
    // per-row ppm sums never exceed 1e6 (floor division)
    got.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._4).sum <= 1000000L, s"row $p over 1e6")
    }
    // transitions never cross users: no b->a from user 8's tail to user 7
    assert(got.map(_._3).sum == 4L)
  }
}
