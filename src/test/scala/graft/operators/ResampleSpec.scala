package graft.operators

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap-filling hourly resample (Resample.hourly). */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = LocalDateTime.parse(s)

  test("missing hours appear zero-filled and the running total carries through gaps") {
    val events = Seq(
      ("a", ts("2024-01-01T00:10:00"), 1.50),
      ("a", ts("2024-01-01T00:40:00"), 2.25),
      // hours 01 and 02 silent
      ("a", ts("2024-01-01T03:05:00"), -0.75),
      ("b", ts("2024-01-01T02:00:00"), 10.0))
      .toDF("event_type", "ts", "value")
    val got = Resample.hourly(events)
      .as[(String, LocalDateTime, Long, Long, Long)].collect().toList
    assert(got == List(
      ("a", ts("2024-01-01T00:00:00"), 2L, 375L, 375L),
      ("a", ts("2024-01-01T01:00:00"), 0L, 0L, 375L),
      ("a", ts("2024-01-01T02:00:00"), 0L, 0L, 375L),
      // floor(-0.75*100) = -75 exactly
      ("a", ts("2024-01-01T03:00:00"), 1L, -75L, 300L),
      ("b", ts("2024-01-01T02:00:00"), 1L, 1000L, 1000L)))
  }

  test("grid length matches each key's span on the real events table") {
    val got = Resample.hourly(graft.sources.Tables.events(spark, sf0001))
    val perKey = got.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        min("hour").as("h0"), max("hour").as("h1"))
      .as[(String, Long, LocalDateTime, LocalDateTime)].collect()
    assert(perKey.length == 5)
    perKey.foreach { case (k, rows, h0, h1) =>
      val hours = ChronoUnit.HOURS.between(h0, h1) + 1
      assert(rows == hours, s"$k: $rows rows vs $hours hours in span")
    }
  }
}
