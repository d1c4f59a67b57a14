package graft.operators

import graft.SparkSpec

/** Pins for the large-query-batch serve path
  * ([[ProductQuantization.ivfPqResRerankBatchTopK]]):
  *
  *  1. the refine stage's two joins really take the SHUFFLE-HASH path —
  *     no broadcast on the candidate→corpus fetch or the query join (the
  *     whole point of the batch form is surviving an nq x C frame no
  *     broadcast can hold), and
  *  2. the shuffle spelling is RESULT-IDENTICAL to the broadcast spelling
  *     at the same (nq, C, k) — the join strategy is a physical choice,
  *     never a semantic one.
  */
class AnnBatchRerankSpec extends SparkSpec {

  test("the batch re-rank joins are shuffle-hash, not broadcast") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val df = ProductQuantization.ivfPqResRerankBatchTopK(emb)
    val plan = df.queryExecution.executedPlan.toString
    val shj = "ShuffledHashJoin".r.findAllIn(plan).size
    assert(shj >= 2,
      s"expected both refine-stage joins to plan as ShuffledHashJoin, found $shj:\n$plan")
  }

  test("the shuffle-hash spelling equals the broadcast spelling row-for-row") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val batch = ProductQuantization.ivfPqResRerankBatchTopK(emb)
      .collect().toSeq
    val broadcastForm = ProductQuantization.ivfPqResRerankTopK(emb,
      nCand = ProductQuantization.BatchCandidates,
      queryMaxId = ProductQuantization.BatchQueries,
      nProbe = ProductQuantization.BatchProbe)
      .collect().toSeq
    assert(batch.nonEmpty, "batch re-rank returned nothing — vacuous")
    assert(batch == broadcastForm,
      "the shuffle-hash and broadcast spellings diverged")
  }
}
