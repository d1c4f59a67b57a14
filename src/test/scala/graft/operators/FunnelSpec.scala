package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Ordered-funnel semantics: strict-after step ordering, depth counting,
  * and the staged-aggregation plan shape (user-keyed, never events x events).
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def events(rows: (Long, Long, String)*): DataFrame =
    rows.map { case (u, t, e) => (u, ts(t), e) }.toDF("user_id", "ts", "event_type")

  test("steps must occur strictly after the previous step's reached time") {
    val ev = events(
      // u1: full funnel in order
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE view -> depth 2 (view reached, purchase not after it)
      (2L, 10L, "signup"), (2L, 30L, "view"), (2L, 20L, "purchase"),
      // u3: view at exactly the signup ts -> NOT strictly after -> depth 1
      (3L, 10L, "signup"), (3L, 10L, "view"),
      // u4: never signed up -> absent from the funnel entirely
      (4L, 10L, "view"), (4L, 20L, "purchase"))
    val got = Funnel.of(ev)
      .select($"user_id", $"depth").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("earliest qualifying time is reported per step, not any qualifying time") {
    val ev = events(
      (1L, 10L, "signup"), (1L, 5L, "signup"), // min signup = 5
      (1L, 7L, "view"), (1L, 9L, "view"), // min view after 5 = 7
      (1L, 6L, "purchase"), (1L, 8L, "purchase")) // min purchase after 7 = 8
    val row = Funnel.of(ev)
      .select($"signup_ts", $"view_ts", $"purchase_ts").as[(Timestamp, Timestamp, Timestamp)]
      .head()
    assert(row == ((ts(5), ts(7), ts(8))))
  }

  test("the conversion deadline is inclusive and resets per step") {
    val h = 3600L
    val ev = events(
      // u1: each step exactly AT the 24h deadline of the previous -> counts
      (1L, 0L, "signup"), (1L, 24 * h, "view"), (1L, 48 * h, "purchase"),
      // u2: view one second past the deadline -> depth 1
      (2L, 0L, "signup"), (2L, 24 * h + 1, "view"),
      // u3: view in time, purchase measured from VIEW's time (not signup's):
      // purchase at view + 24h counts even though it is signup + 25h
      (3L, 0L, "signup"), (3L, 1 * h, "view"), (3L, 25 * h, "purchase"))
    val got = Funnel.ofWindowed(ev)
      .select($"user_id", $"depth").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 3))
  }

  test("a later in-window occurrence rescues a step an early one misses") {
    val h = 3600L
    // the 30h view is out of window, but the 40h SECOND signup is not a
    // step; only the FIRST signup anchors -> view never converts
    val ev = events(
      (1L, 0L, "signup"), (1L, 40 * h, "signup"), (1L, 30 * h, "view"))
    val got = Funnel.ofWindowed(ev)
      .select($"user_id", $"depth").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1))
  }

  test("the report counts step reach and ppm conversion exactly") {
    // 4 users sign up, 2 view, 1 purchases
    val ev = events(
      (1L, 1L, "signup"), (2L, 1L, "signup"), (3L, 1L, "signup"),
      (4L, 1L, "signup"),
      (1L, 2L, "view"), (2L, 2L, "view"),
      (1L, 3L, "purchase"))
    val got = Funnel.report(ev)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1_signup", 4L, 1000000L),
      ("2_view", 2L, 500000L),
      ("3_purchase", 1L, 500000L)))
  }

  test("the report agrees with the per-user funnel on the corpus") {
    val f = Funnel.funnel(spark, sf0001).select($"depth").as[Int].collect()
    val got = Funnel.reportEvents(spark, sf0001)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got("1_signup") == f.count(_ >= 1))
    assert(got("2_view") == f.count(_ >= 2))
    assert(got("3_purchase") == f.count(_ >= 3))
  }

  test("plan: every stage is a user-keyed hash join/agg, no cartesian") {
    val plan = Funnel.of(events((1L, 1L, "signup")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
