package graft.operators

import graft.SparkSpec

/** Exact-count guarantee: every source gets exactly floor-boundary split
  * counts regardless of its size, and the assignment is deterministic and
  * layout-invariant.
  */
class StratifiedSplitSpec extends SparkSpec {
  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.groupBy($"source", $"split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("every source splits at exact integer boundaries (uneven sizes included)") {
    // sources of size 30, 7, 3, 1 — exact expected counts per the
    // rank*100 <= pct*n_s boundaries
    val docs = ((0L until 30L).map(d => (d, "big")) ++
      (30L until 37L).map(d => (d, "mid")) ++
      (37L until 40L).map(d => (d, "small")) ++
      Seq((40L, "solo")))
      .map { case (d, s) => (d, s, "x") }.toDF("doc_id", "source", "text")
    val c = counts(StratifiedSplit.split(docs)).withDefaultValue(0L)
    assert(c(("big", "train")) == 24 && c(("big", "valid")) == 3 && c(("big", "test")) == 3)
    // n_s=7: train floor(5.6)=5, valid ranks 6 (6*100<=630), test 1
    assert(c(("mid", "train")) == 5 && c(("mid", "valid")) == 1 && c(("mid", "test")) == 1)
    // n_s=3: train ranks 1,2 (200<=240); valid none (300>270); test 1
    assert(c(("small", "train")) == 2 && c(("small", "valid")) == 0 && c(("small", "test")) == 1)
    // n_s=1: rank 1, 100 > 80 and > 90 -> test
    assert(c(("solo", "test")) == 1)
  }

  test("the assignment equals the windowed row_number model") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L)
      .map(d => (d, s"s${rnd.nextInt(5)}", "x")).toDF("doc_id", "source", "text")
    val got = StratifiedSplit.split(docs)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    // driver-side model: row_number per source under the same salted order
    // (hash values pulled through Spark so the order matches exactly)
    import org.apache.spark.sql.functions.{col, concat, lit}
    val hashed = docs.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.hash60(concat(
        lit(StratifiedSplit.StratSalt), col("doc_id").cast("string"))).as("hv"))
      .as[(Long, String, Long)].collect()
    val model = hashed.groupBy(_._2).iterator.flatMap { case (_, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case (d, i) =>
        val rank = i + 1L
        val split = if (rank * 100 <= 80L * n) "train"
          else if (rank * 100 <= 90L * n) "valid" else "test"
        d._1 -> split
      }
    }.toMap
    assert(got == model)
  }

  test("the corpus split is deterministic and input-layout-invariant") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val a = StratifiedSplit.split(docs).as[(Long, String, String)].collect().sortBy(_._1)
    val b = StratifiedSplit.split(docs.repartition(7))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    val c = counts(StratifiedSplit.split(docs))
    assert(c.keys.map(_._1).toSet.size == 20)
  }
}
