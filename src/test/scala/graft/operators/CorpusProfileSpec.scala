package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Column-profile semantics: null accounting, exact distincts, string
  * min/max rendering, and the one-pass corpus run.
  */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  test("nulls, distincts, and min/max render per column") {
    val docs = Seq(
      (1L, Option("en"), Option(10L), Option("web")),
      (2L, None, Option(250L), Option("web")),
      (3L, Option("de"), None, Option("books")))
      .toDF("doc_id", "lang", "n_chars", "source")
    val got = CorpusProfile.profile(docs)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("doc_id") == (("doc_id", 3L, 0L, 3L, "1", "3")))
    assert(got("lang") == (("lang", 3L, 1L, 2L, "de", "en")))
    assert(got("n_chars") == (("n_chars", 3L, 1L, 2L, "10", "250")))
    assert(got("source") == (("source", 3L, 0L, 2L, "books", "web")))
  }

  test("corpus run: one row per profiled column, counts reconcile") {
    val rows = CorpusProfile.profileDocuments(spark, sf0001)
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(rows.map(_._1).toSeq == CorpusProfile.Columns.sorted)
    val n = rows.head._2
    rows.foreach { r =>
      assert(r._2 == n, "row count differs between columns")
      assert(r._4 <= r._2 - r._3, s"${r._1}: distinct exceeds non-nulls")
    }
    // doc_id is a key: fully distinct, no nulls
    val docId = rows.find(_._1 == "doc_id").get
    assert(docId._3 == 0L && docId._4 == n)
  }

  test("plan: one scan, no join, metadata columns only") {
    val plan = CorpusProfile.profileDocuments(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1)
    assert(!plan.contains("Join"))
    assert(!plan.toLowerCase.contains("text#"), "text column dragged into scan")
  }
}
