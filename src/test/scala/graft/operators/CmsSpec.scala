package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch: the defining overcount inequality, frequency (not
  * cardinality) semantics, saturation behavior, and partition invariance.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  /** (user_id, event_type) rows; `copies` controls multiplicity. */
  private def frame(nUsers: Int, copies: Int = 1) = {
    val rows = for {
      u <- 0 until nUsers
      c <- 0 until copies
    } yield (u.toLong, s"t${u % 3}")
    rows.toDF("user_id", "event_type")
  }

  test("estimates never undercount: est >= exact for every probe key") {
    val got = Sketches.cmsCounts(frame(500, copies = 2), probeMaxUser = 500L)
      .select($"overcount").as[Long].collect()
    assert(got.nonEmpty)
    assert(got.forall(_ >= 0L), got.mkString(","))
  }

  test("collisions occur once keys exceed the grid width — overcounts are real") {
    // 500 distinct keys in 4x64 counters: some probe must collide in all
    // 4 rows (coupon-collector style; deterministic given the fixed salt)
    val got = Sketches.cmsCounts(frame(500), probeMaxUser = 500L)
      .select($"overcount").as[Long].collect()
    assert(got.exists(_ > 0L), s"no collisions at 500 keys / ${Sketches.CmsWidth} width")
  }

  test("frequency semantics: tripling every row triples every counter and estimate") {
    val once = Sketches.cmsCounts(frame(200), probeMaxUser = 200L)
      .select($"user_id", $"event_type", $"est_count").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val tripled = Sketches.cmsCounts(frame(200, copies = 3), probeMaxUser = 200L)
      .select($"user_id", $"event_type", $"est_count").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(tripled.keySet == once.keySet)
    once.foreach { case (k, est) => assert(tripled(k) == 3L * est, k) }
  }

  test("grid stays grid-sized: at most depth x width counters at any cardinality") {
    val n = Sketches.cmsSketch(Sketches.cmsKeyed(frame(5000))).count()
    assert(n <= Sketches.CmsDepth * Sketches.CmsWidth, n)
  }

  test("partition invariance: the sketch is identical under any input split") {
    val base = frame(300, copies = 2)
    val a = Sketches.cmsCounts(base.repartition(1), probeMaxUser = 300L).collect()
    val b = Sketches.cmsCounts(base.repartition(17), probeMaxUser = 300L).collect()
    assert(a.sameElements(b))
  }

  test("join-size estimate never undercounts and is exact without collisions") {
    // tiny key domain (8 keys << width 64): no collisions, est == true
    val l = Sketches.cmsKeyed(frame(8, copies = 3))
    val r = Sketches.cmsKeyed(frame(8, copies = 2))
    val exact = Sketches.cmsJoinSize(l, r)
      .select($"est_join_size", $"true_join_size", $"overcount")
      .as[(Long, Long, Long)].head()
    // true = sum over keys of 3*2 = 8*6 = 48
    assert(exact == ((48L, 48L, 0L)), exact)
    // wide key domain (600 keys >> width): collisions force est > true
    val lw = Sketches.cmsKeyed(frame(600))
    val rw = Sketches.cmsKeyed(frame(600))
    val over = Sketches.cmsJoinSize(lw, rw)
      .select($"overcount").as[Long].head()
    assert(over > 0L, s"no collision overcount at 600 keys")
  }

  test("null keys are dropped, not hashed as the string 'null'") {
    val withNulls = Seq((Some(1L), Some("a")), (None, Some("a")), (Some(2L), None))
      .toDF("user_id", "event_type")
    val keyed = Sketches.cmsKeyed(withNulls)
    assert(keyed.count() == 1L)
  }
}
