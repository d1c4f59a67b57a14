package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Robust median/MAD outlier profile: driver-model agreement on the real
  * events table (exact half-integer medians, exact fence counts).
  */
class AnomalyMadSpec extends SparkSpec {
  import spark.implicits._

  private def medianOfLongs(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def medianOfDoubles(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("median/MAD/outlier counts agree exactly with a sequential driver model") {
    val rows = Tables.events(spark, sf0001)
      .select($"event_type", floor($"value" * 100).cast("long").as("cents"))
      .as[(String, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val cents = g.map(_._2).toSeq
      val med = medianOfLongs(cents)
      val adev = cents.map(c => math.abs(c - med))
      val mad = medianOfDoubles(adev)
      et -> ((med, mad, cents.size.toLong, adev.count(_ > 3 * mad).toLong))
    }
    val got = Relational.anomalyMad(spark, sf0001)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected)
    // the fence is non-vacuous on the real data: some group has outliers
    assert(got.values.exists(_._4 > 0L), got)
  }
}
