package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Gap-histogram semantics: per-user lag under the total order, the
  * zero-gap band, and conservation of gap count.
  */
class GapHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("decades are exact on a hand-checked input") {
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: gaps 5 s, 55 s; user 2: one 0 s gap (tie broken by id);
    // cross-user boundaries contribute nothing
    val events = Seq(
      (1L, 1L, t("2024-01-01 00:00:00")),
      (2L, 1L, t("2024-01-01 00:00:05")),
      (3L, 1L, t("2024-01-01 00:01:00")),
      (4L, 2L, t("2024-01-01 00:00:00")),
      (5L, 2L, t("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = GapHistogram.decades(events)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 2L, 0L, 5L), (1L, 1L, 55L, 55L)))
  }

  test("the driver histogram conserves gaps = events - users") {
    val events = graft.sources.Tables.events(spark, sf0001)
    val nUsers = events.select("user_id").distinct().count()
    val n = events.count()
    val got = GapHistogram.decadesEvents(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == n - nUsers)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    got.foreach { r => assert(r._3 >= 0 && r._3 <= r._4) }
  }
}
