package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics pins for [[M4Downsample]]: the four kept points are the
  * bucket's true extremes, and every tie resolves by the documented
  * lexicographic rule (value ties → earlier us → smaller event_id).
  */
class M4DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200000000L // 2024-01-01T00:00Z micros

  private def ev(id: Long, offsetUs: Long, typ: String, v: Double) =
    (id, new Timestamp((base + offsetUs) / 1000), typ, v)

  test("per-bucket extremes and tie rules") {
    val w = M4Downsample.BucketMicros
    val rows = Seq(
      ev(1L, 10L * 1000000, "a", 5.0), // first
      ev(2L, 20L * 1000000, "a", 1.0), // min (tied with 3 on value)
      ev(3L, 30L * 1000000, "a", 1.0), // later tie loser
      ev(4L, 40L * 1000000, "a", 9.0), // max
      ev(5L, 50L * 1000000, "a", 7.0), // last
      ev(6L, w + 1000000, "a", 2.0)) // next bucket, alone
      .toDF("event_id", "ts", "event_type", "value")
      .withColumn("ts", $"ts".cast("timestamp_ntz"))
    val got = M4Downsample.downsample(rows).collect().map(_.toSeq)
    val b0 = base / w
    assert(got.length == 2)
    assert(got(0) == Seq("a", b0, 5L,
      base + 10000000L, 500L, // first
      base + 50000000L, 700L, // last
      base + 20000000L, 100L, // min: value tie broken to the EARLIER point
      base + 40000000L, 900L)) // max
    assert(got(1) == Seq("a", b0 + 1, 1L,
      base + w + 1000000L, 200L, base + w + 1000000L, 200L,
      base + w + 1000000L, 200L, base + w + 1000000L, 200L))
  }
}
