package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Heatmap semantics: bucket domain, event conservation, and the epoch
  * dow arithmetic cross-checked against Spark's own calendar function.
  */
class HourHeatmapSpec extends SparkSpec {

  private lazy val hm = Relational.hourHeatmap(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("buckets stay on the 7x24 grid and conserve the event count") {
    assert(hm.keys.forall { case (d, h) => d >= 0 && d < 7 && h >= 0 && h < 24 })
    assert(hm.values.sum == Tables.events(spark, sf0001).count())
  }

  test("the integer epoch dow equals Spark's calendar dayofweek everywhere") {
    // independent path: dayofweek() is 1 = Sunday, the operator's integer
    // arithmetic is 0 = Sunday
    val cal = Tables.events(spark, sf0001)
      .groupBy((dayofweek(col("ts").cast("timestamp")) - 1).cast("long").as("dow"),
        hour(col("ts").cast("timestamp")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hm == cal)
  }
}
