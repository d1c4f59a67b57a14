package graft.operators

import graft.SparkSpec

/** Semantics pins for [[SessionGapSweep]]: the G=30 row reconciles
  * EXACTLY with the certified session operator's count (same >= boundary
  * semantics), and the curve is monotone (a wider gap can only merge
  * sessions, never split them).
  */
class SessionGapSweepSpec extends SparkSpec {

  test("the 30-minute row equals q_session_windows' session count; curve monotone") {
    val rows = SessionGapSweep.sweepEvents(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows.map(_._1) == SessionGapSweep.GapsMinutes)
    val sessions30 = rows.find(_._1 == 30).get._2
    val certified = Relational.sessionWindows(spark, sf0001).count()
    assert(sessions30 == certified,
      s"gap-sweep 30m row $sessions30 != q_session_windows $certified")
    // monotone: session count nonincreasing in the gap
    rows.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2, s"sessions grew with the gap: $a -> $b")
        assert(b._4 >= a._4, "mean session length shrank with the gap")
      case _ => ()
    }
    // n_users is the floor: every curve point is >= one session per user
    rows.foreach { case (_, s, u, _) => assert(s >= u) }
  }
}
