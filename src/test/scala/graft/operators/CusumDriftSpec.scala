package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** CUSUM semantics: the H-scaled integer deviation, the step-change peak
  * location, and the flat-series zero.
  */
class CusumDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("a step change peaks exactly at the boundary; flat series is zero") {
    // type "step": 4 hours at 100 then 4 at 300 cents -> T=1600, H=8,
    // D_h*H = cum*8 - h*1600; peak |.| at h=4: 400*8-4*1600 = -3200
    // type "flat": constant 200 -> deviation identically zero
    val rows =
      (0 until 8).map(h => ("step", ts(h), if (h < 4) 1.0 else 3.0)) ++
      (0 until 8).map(h => ("flat", ts(h), 2.0))
    val df = rows.toDF("event_type", "ts", "value")
    val got = CusumDrift.drift(df)
      .as[(String, Long, Long, Long, Timestamp)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("step") == (("step", 8L, 1600L, 3200L, ts(3))))
    // flat: all deviations 0 -> earliest hour wins the tie
    assert(got("flat") == (("flat", 8L, 1600L, 0L, ts(0))))
  }

  test("the driver report is total and closes the fold per type") {
    val df = CusumDrift.driftEvents(spark, sf0001)
      .as[(String, Long, Long, Long, Timestamp)].collect()
    assert(df.length == 5)
    df.foreach { r => assert(r._2 > 0 && r._4 >= 0) }
  }
}
