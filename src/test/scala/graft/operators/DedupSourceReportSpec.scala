package graft.operators

import graft.SparkSpec

/** Source-report semantics: within-source rates, the cross-source
  * sharing flag, and reconciliation with dedup_exact's totals.
  */
class DedupSourceReportSpec extends SparkSpec {
  import spark.implicits._

  test("rates and sharing are exact on a hand-checked input") {
    // source a: x, x, y (1 within-source dup); source b: y, z
    // "y" is shared across a and b
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "y", "a"),
      (4L, "y", "b"), (5L, "z", "b")
    ).toDF("doc_id", "text", "source")
    val got = DedupSourceReport.report(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("a", 3L, 2L, 1000000L / 3, 1L),
      ("b", 2L, 2L, 0L, 1L)))
  }

  test("the driver report reconciles with dedup_exact") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val rep = DedupSourceReport.reportDocuments(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.length == 20)
    assert(rep.map(_._2).sum == docs.count())
    // sum of per-source distincts >= global distincts (shared contents
    // count once per source here, once globally in dedup_exact)
    val globalDistinct = Dedup.exact(docs).count()
    assert(rep.map(_._3).sum >= globalDistinct)
  }
}
