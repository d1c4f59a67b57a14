package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The fused corpus-cleaning pipeline: per-stage semantics must equal the
  * standalone operators' (composition adds no new logic), duplicates must
  * collapse to the lowest doc_id with an exact copy count, and the plan must
  * stay single-shuffle (gates narrow, one aggregate exchange).
  */
class CleanCorpusSpec extends SparkSpec {
  import spark.implicits._

  // " the  a and of to " pushes the stop factor up; 70 filler tokens clear
  // the length factor — comfortably above QualityMin, predicted "en"
  private val good =
    ("the a and of to " * 14) + ("alpha bravo " * 7)
  // no stopword markers, no alpha beyond one char — below QualityMin
  private val junk = "0 1 2 3 4 5 6 7 8 9 " * 8

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  test("gates, dedup, and split compose exactly like the standalone operators") {
    val in = docs(
      (1L, good, "en"),   // kept
      (2L, good, "en"),   // exact duplicate of 1 — collapses into it
      (3L, good, "de"),   // language gate: predicted en, labeled de
      (4L, junk, "en"),   // quality gate
      (5L, good + " extra", "en")) // kept, distinct content
    val out = CleanCorpus.clean(in)
      .select($"doc_id", $"n_copies", $"split", $"quality")
      .as[(Long, Long, String, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 5L))
    assert(out.find(_._1 == 1L).get._2 == 2L) // docs 1+2 were copies
    assert(out.find(_._1 == 5L).get._2 == 1L)
    // the split label is the standalone operator's assignment for the SAME id
    val standaloneSplit = TextAnalysis.split(in.filter($"doc_id".isin(1L, 5L)))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, _, s, _) => standaloneSplit(id) == s })
    // the quality column is the standalone operator's score for the SAME doc
    val standaloneQ = TextAnalysis.quality(in)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(out.forall { case (id, _, _, q) => standaloneQ(id) == q })
    assert(out.forall(_._4 >= CleanCorpus.QualityMin))
  }

  test("the fused plan has exactly one aggregate exchange (gates stay narrow)") {
    val df = CleanCorpus.clean(docs((1L, good, "en"), (2L, junk, "en")))
    val plan = df.queryExecution.executedPlan.toString
    // shuffles: ONE hashpartitioning exchange for the dedup agg plus the
    // final presentation sort's range exchange — nothing else is wide
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).toSeq
    assert(exchanges.count(_.contains("hashpartitioning")) == 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
