package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Cohort retention matrix: driver-model agreement on the real events table
  * plus structural invariants.
  */
class RetentionCohortSpec extends SparkSpec {
  import spark.implicits._

  private def monthNum(d: LocalDateTime): Int = d.getYear * 12 + d.getMonthValue

  test("matrix agrees with a sequential driver model over sf0.001 events") {
    val events = Tables.events(spark, sf0001)
      .select($"user_id", date_trunc("month", $"ts").cast("timestamp_ntz").as("m"))
      .as[(Long, java.time.LocalDateTime)].collect()
    val byUser = events.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val expected = byUser.toSeq.flatMap { case (_, months) =>
      val cohort = months.min((x: LocalDateTime, y: LocalDateTime) => x.compareTo(y))
      months.map(m => (cohort, monthNum(m) - monthNum(cohort)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = Relational.retentionCohort(spark, sf0001)
      .as[(java.time.LocalDateTime, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected)
  }

  test("age-0 cells account for every user exactly once") {
    val nUsers = Tables.events(spark, sf0001)
      .select(countDistinct($"user_id")).as[Long].head()
    val age0 = Relational.retentionCohort(spark, sf0001)
      .filter($"age_months" === 0)
      .agg(sum($"n_users")).as[Long].head()
    // every user is active in their own cohort month by definition
    assert(age0 == nUsers)
  }
}
