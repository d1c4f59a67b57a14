package graft.operators

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Cohort retention matrix: driver-model agreement on the real events table
  * plus structural invariants.
  */
class RetentionCohortSpec extends SparkSpec {
  import spark.implicits._

  test("matrix agrees with a sequential driver model over sf0.001 events") {
    val events = Tables.events(spark, sf0001)
      .select($"user_id", date_trunc("day", $"ts").cast("timestamp_ntz").as("d"))
      .as[(Long, LocalDateTime)].collect()
    val byUser = events.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val expected = byUser.toSeq.flatMap { case (_, days) =>
      val cohort = days.min((x: LocalDateTime, y: LocalDateTime) => x.compareTo(y))
      days.map(d => (cohort,
        ChronoUnit.DAYS.between(cohort.toLocalDate, d.toLocalDate).toInt))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = Relational.retentionCohort(spark, sf0001)
      .as[(LocalDateTime, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected)
    // the matrix is non-vacuous: a real retention curve (many distinct
    // ages) exists; at sf0.001 every user's first activity is day one, so
    // cohort COUNT is a data property and not asserted
    assert(got.keys.exists(_._2 > 0) && got.size > 5)
  }

  test("age-0 cells account for every user exactly once") {
    val nUsers = Tables.events(spark, sf0001)
      .select(countDistinct($"user_id")).as[Long].head()
    val age0 = Relational.retentionCohort(spark, sf0001)
      .filter($"age_days" === 0)
      .agg(sum($"n_users")).as[Long].head()
    // every user is active on their own cohort day by definition
    assert(age0 == nUsers)
  }
}
