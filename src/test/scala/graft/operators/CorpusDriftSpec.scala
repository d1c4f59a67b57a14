package graft.operators

import graft.SparkSpec

/** TV-drift semantics: zero on identical distributions (including pure
  * growth), full-scale on disjoint vocabularies, positive on the carve.
  */
class CorpusDriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, String)*) = rows.toDF("source", "text")

  private def one(old: org.apache.spark.sql.DataFrame,
      neu: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
    val r = CorpusDrift.drift(old, neu).collect()
    assert(r.length == 1)
    (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
  }

  test("identical snapshots drift zero") {
    val d = df(("s", "alpha beta gamma"), ("s", "beta gamma delta"))
    val (_, _, num, ppm) = one(d, d)
    assert(num == 0L && ppm == 0L)
  }

  test("pure growth with the same distribution drifts zero (scale-free)") {
    val old = df(("s", "alpha beta"), ("s", "alpha gamma"))
    val neu = old.unionAll(old) // 2x the corpus, identical distribution
    val (o, n, num, ppm) = one(old, neu)
    assert(o * 2 == n)
    assert(num == 0L && ppm == 0L, s"doubling the corpus reported drift $num")
  }

  test("disjoint vocabularies drift at full scale (tv_ppm = 1e6)") {
    val (_, _, _, ppm) = one(df(("s", "alpha beta gamma")), df(("s", "delta eps zeta")))
    assert(ppm == 1000000L)
  }

  test("a source present in only one snapshot reports the TV = 1 sentinel, not NULL") {
    // one-sided sources make the ppm divisor 2*o_total*n_total zero; the
    // guard must emit the mathematically correct 1000000 (TV distance is
    // exactly 1 against an empty distribution) instead of Spark div's NULL
    val old = df(("gone", "alpha beta"), ("both", "one two"))
    val neu = df(("new", "gamma delta"), ("both", "one two"))
    val rows = CorpusDrift.drift(old, neu).collect()
      .map(r => r.getString(0) -> (r.isNullAt(4), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(rows("gone") == (false, 1000000L), s"one-sided source: ${rows("gone")}")
    assert(rows("new") == (false, 1000000L), s"one-sided source: ${rows("new")}")
    assert(rows("both") == (false, 0L))
  }

  test("sources are independent: drift confined to the shifted source") {
    val old = df(("a", "alpha beta"), ("b", "one two three"))
    val neu = df(("a", "alpha beta"), ("b", "four five six"))
    val bySrc = CorpusDrift.drift(old, neu).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(bySrc("a") == 0L && bySrc("b") == 1000000L)
  }

  test("the carved snapshots report positive drift at sf0.001") {
    val out = CorpusDrift.driftDocuments(spark, sf0001)
      .select($"tv_ppm").as[Long].collect()
    assert(out.length == 20)
    assert(out.forall(p => p >= 0L && p <= 1000000L))
    assert(out.exists(_ > 0L), "carve produced no drift — vacuous")
  }
}
