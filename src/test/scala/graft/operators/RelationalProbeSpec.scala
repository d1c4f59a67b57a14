package graft.operators

import graft.SparkSpec

/** Pins the probe-family regimes of the two relational fixtures whose raw
  * driver-data results were vacuous (round-19 verdict: `q_set_ops` 0 rows at
  * ALL scales, `q_anti_join` 0 at both gate scales): the kept probe rows must
  * appear and the excluded families must not, so the oracle gate can never
  * regress to an empty==empty match unnoticed.
  */
class RelationalProbeSpec extends SparkSpec {

  test("antiJoin keeps the orderless probe family and excludes the ordered one") {
    val keys = Relational.antiJoin(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(keys.nonEmpty)
    // sf0.001 customer keys are 0..149: the seed is c_custkey = 7
    assert(keys.contains(1000007L), "orderless probe twin must be kept")
    assert(!keys.contains(2000007L), "probe twin WITH a probe order must be excluded")
    assert(!keys.exists(k => k >= 2000000L), "no 2e6-family row may survive")
  }

  test("antiJoin probe names carry the probe marker") {
    val probeNames = Relational.antiJoin(spark, sf0001)
      .collect().filter(_.getLong(0) >= 1000000L).map(_.getString(1)).toSeq
    assert(probeNames == Seq("Probe#1000007"))
  }

  test("setOps keeps click+purchase-never-error and excludes the other regimes") {
    val users = Relational.setOps(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(users.nonEmpty)
    // sf0.001 user ids are 0..14: the seed is user_id = 3
    assert(users.contains(1000003L), "click+purchase, never-error probe must be kept")
    assert(!users.contains(2000003L), "click+purchase+ERROR probe must be excluded (EXCEPT)")
    assert(!users.contains(3000003L), "click-only probe must be excluded (INTERSECT)")
  }
}
