package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Bucketed point-in-interval join: inclusive boundaries, non-midnight
  * residual filtering, and the plan must be an equi-join (no nested loop —
  * the very thing the operator exists to avoid).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inclusive boundaries and non-midnight residual exactness") {
    val points = Seq(
      ts("2024-01-01 00:00:00"), // == interval start: inclusive
      ts("2024-01-03 12:00:00"), // strictly inside
      ts("2024-01-05 00:00:00"), // == interval end: inclusive
      ts("2024-01-05 08:00:00"), // same DAY as the end but past it: residual must drop
      ts("2024-02-01 00:00:00")) // far outside
      .toDF("p")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi")
      .select($"p").as[Timestamp].collect().toSet
    assert(got == Set(
      ts("2024-01-01 00:00:00"),
      ts("2024-01-03 12:00:00"),
      ts("2024-01-05 00:00:00")))
  }

  test("agrees with the brute-force containment model on a seeded random instance") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    def randTs() = new Timestamp(base + rnd.nextInt(40 * 24) * 3600000L +
      rnd.nextInt(3600000)) // random hour + sub-hour offset over 40 days
    val pts = (1 to 60).map(_ => randTs())
    // ~1/6 of intervals generated inverted: must match nothing, not crash
    val ivs = (1 to 80).map { i =>
      val a = randTs()
      val span = (rnd.nextInt(7 * 24) - 24) * 3600000L
      (i.toLong, a, new Timestamp(a.getTime + span))
    }
    val got = RangeJoin.pointInInterval(
      pts.toDF("p"), "p", ivs.toDF("iv_id", "lo", "hi"), "lo", "hi")
      .select($"p", $"iv_id").as[(Timestamp, Long)].collect().toSet
    val expected = (for {
      p <- pts
      (id, lo, hi) <- ivs
      if !p.before(lo) && !p.after(hi)
    } yield (p, id)).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the instance actually exercises matches
  }

  test("overlapping intervals each match; the plan is an equi-join") {
    val points = Seq(ts("2024-01-02 00:00:00")).toDF("p")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00")),
      (3L, ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00")))
      .toDF("iv_id", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi")
    assert(out.select($"iv_id").as[Long].collect().toSet == Set(1L, 2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
