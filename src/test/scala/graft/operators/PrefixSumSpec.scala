package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Distributed-scan semantics: exact totals across partition boundaries,
  * agreement with the single-partition window spelling, and the
  * ContiguousId special case.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("the scan is exact across many partitions on a hand-checked order") {
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "w")
      .repartition(13) // scramble the layout; the scan re-ranges on k
    val got = PrefixSum.withRunningTotal(df, "w", "cum", Seq(col("k")))
      .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
    var run = 0L
    (1L to 1000L).foreach { i =>
      run += i % 7
      assert(got(i) == run, s"k=$i")
    }
  }

  test("the scan equals the window spelling on the corpus token order") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.nTokens(col("text")).cast("long").as("w"))
    val scan = PrefixSum.withRunningTotal(toks, "w", "cum", Seq(col("doc_id")))
      .select(col("doc_id"), col("cum")).as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val win = toks.withColumn("cum", sum(col("w")).over(w))
      .select(col("doc_id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(scan == win)
  }

  test("weight 1 reproduces ContiguousId") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), lit(1L).as("one"))
    val scan = PrefixSum.withRunningTotal(df, "one", "pos", Seq(col("doc_id")))
      .select(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cid = ContiguousId.assign(df, "pos", Seq(col("doc_id")))
      .select(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scan == cid)
  }
}
