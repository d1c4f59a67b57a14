package graft.operators

import graft.SparkSpec

/** Latency-histogram semantics: item conservation, non-negative whole
  * days, and the TPC-H 1..121-day shipping window.
  */
class ShipLatencySpec extends SparkSpec {
  import spark.implicits._

  test("the histogram conserves lineitems and the division is exact") {
    val n = graft.sources.Tables.lineitem(spark, sf0001).count()
    val got = ShipLatency.histogramTables(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(got.map(_._2).sum == n)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // both sides of the fixture's gaps appear (the audit half is live)
    assert(got.head._1 < 0 && got.last._1 > 0)
  }

  test("both date columns are midnight-aligned (the exactness premise)") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .filter(pmod(unix_micros(col("l_shipdate").cast("timestamp")),
        lit(86400000000L)) =!= 0).count()
    val o = graft.sources.Tables.orders(spark, sf0001)
      .filter(pmod(unix_micros(col("o_orderdate").cast("timestamp")),
        lit(86400000000L)) =!= 0).count()
    assert(li == 0 && o == 0)
  }
}
