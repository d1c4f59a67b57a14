package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Sweep semantics: the half-open boundary rule, the earliest-peak tie,
  * and the corpus sanity bound.
  */
class PeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = t(s).getTime * 1000L

  test("overlaps count and back-to-back sessions do not") {
    // u1 09:00-10:00, u2 09:30-10:30 (overlap -> 2);
    // u3 10:30-11:00 starts exactly as u2 ends -> never 3
    val sessions = Seq(
      (1L, t("2024-01-01 09:00:00"), t("2024-01-01 10:00:00"), 1L),
      (2L, t("2024-01-01 09:30:00"), t("2024-01-01 10:30:00"), 1L),
      (3L, t("2024-01-01 10:30:00"), t("2024-01-01 11:00:00"), 1L)
    ).toDF("user_id", "session_start", "session_end", "n_events")
    val got = PeakConcurrency.peak(sessions).as[(Long, Long)].head()
    assert(got == ((2L, us("2024-01-01 09:30:00"))))
  }

  test("the driver peak is positive and bounded by the user count") {
    val got = PeakConcurrency.peakEvents(spark, sf0001).as[(Long, Long)].collect()
    assert(got.length == 1)
    val nUsers = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(got.head._1 >= 1 && got.head._1 <= nUsers)
  }
}
