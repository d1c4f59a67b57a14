package graft.operators

import graft.SparkSpec

/** Usefulness guards for the approximate dedup paths (the oracle rows prove
  * reproducibility, not usefulness — same class of check that caught the
  * degenerate single-table ANN recall). Ground truth is brute-force Jaccard
  * over the hashed shingle sets, computed in-test (the sf0.001 corpus is
  * small enough for all-pairs).
  */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val truthAt: Map[Double, Set[(Long, Long)]] = {
    val sets = Dedup.hashedShingleSets(
      graft.sources.Tables.documents(spark, sf0001))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, sh) => (id, sh.toSet) }
    val pairs = for {
      i <- sets.indices
      j <- (i + 1) until sets.length
      (a, sa) = sets(i)
      (b, sb) = sets(j)
      jac = (sa & sb).size.toDouble / (sa | sb).size
    } yield ((math.min(a, b), math.max(a, b)), jac)
    Map(
      0.5 -> pairs.filter(_._2 >= 0.5).map(_._1).toSet,
      0.4 -> pairs.filter(_._2 >= 0.4).map(_._1).toSet)
  }

  private def found(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("minhashLsh: perfect precision (verified candidates), bounded recall loss") {
    val truth = truthAt(0.5)
    assert(truth.nonEmpty)
    val got = found(Dedup.minhashLsh(
      graft.sources.Tables.documents(spark, sf0001)))
    val precision = if (got.isEmpty) 1.0 else (got & truth).size.toDouble / got.size
    val recall = (got & truth).size.toDouble / truth.size
    info(f"minhash truth=${truth.size} found=${got.size} precision=$precision%.3f recall=$recall%.3f")
    assert(precision == 1.0) // candidates are exact-Jaccard-verified
    assert(recall >= 0.5, f"banding recall degenerated: $recall%.3f")
  }

  test("ngramJaccard finds EXACTLY the true pairs when the df-cap is inactive") {
    // sf0.001 has ~50 docs, so no shingle can exceed MaxShingleDf=128:
    // the inverted index is exhaustive and the operator must equal truth
    val truth = truthAt(0.4)
    val got = found(Dedup.ngramJaccard(
      graft.sources.Tables.documents(spark, sf0001)))
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }
}
