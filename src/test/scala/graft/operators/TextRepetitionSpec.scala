package graft.operators

import graft.SparkSpec

/** Repetition signals on planted degenerate/diverse docs. */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def rep(rows: (Long, String)*) =
    TextAnalysis.repetition(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("a looping doc maxes the repetition signals; a diverse doc floors them") {
    val got = rep(
      (1L, "spam spam spam spam"),
      (2L, "alpha beta gamma delta"),
      (3L, "one two one two one two"))
    assert(got(1L) == ((4L, 0.25, 3L, 1.0))) // every bigram is "spam spam"
    assert(got(2L) == ((4L, 1.0, 1L, 0.333333))) // all bigrams distinct
    // "one two" appears 3x of 5 bigrams; ratio 2 distinct / 6 tokens
    assert(got(3L) == ((6L, 0.333333, 3L, 0.6)))
  }

  test("empty and single-token docs don't blow up the bigram fold") {
    val got = rep((1L, ""), (2L, "solo"))
    assert(got(1L) == ((1L, 1.0, 0L, 0.0))) // split('') -> [''], no bigrams
    assert(got(2L) == ((1L, 1.0, 0L, 0.0)))
  }

  test("the tokenize-and-count pass runs ONCE per row: one repetition_stats in the plan") {
    // five derived columns extract fields from ONE aliased struct; if
    // projection collapse ever re-inlines the expression into each
    // referencing column (the 23 s fold pathology), this count jumps to 5.
    // Range input, not a local relation — ConvertToLocalRelation would
    // otherwise evaluate the whole projection at plan time
    import org.apache.spark.sql.functions._
    val docs = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("a b a b w"), col("id")).as("text"))
    val plan = TextAnalysis.repetition(docs).queryExecution.executedPlan.toString
    val n = "repetition_stats".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly one repetition_stats evaluation, got $n:\n$plan")
  }
}
