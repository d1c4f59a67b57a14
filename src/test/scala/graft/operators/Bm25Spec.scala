package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Pins the BM25 serve contract: the exact scoring formula (hand-computed
  * micro-nats on a tiny corpus), self-exclusion, the MoreLikeThis
  * query-term bound, and the integral RRF fusion arithmetic (present-in-
  * both beats present-in-one; absent ranks report 0).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  /** The operator's formula, reference-spelled: floored micro-nats summed
    * over matched terms. tf/df/len/n/totalLen all from the same corpus.
    */
  private def contribUnats(tf: Long, df: Long, len: Long,
      n: Long, totalLen: Long): Long = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val sat = tf * (Bm25.K1 + 1.0) /
      (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * len * n / totalLen))
    math.floor(idf * sat * 1e6).toLong
  }

  test("bm25 score is the exact hand-computed micro-nat sum") {
    // query doc 0 ("a b"); doc 10 matches both terms, doc 11 matches one;
    // doc 12 shares nothing. n=4 docs, total_len = 2+3+2+1 = 8.
    val d = docs(0L -> "a b", 10L -> "a b c", 11L -> "b x", 12L -> "y")
    val out = Bm25.bm25TopK(d).orderBy($"rank")
      .select($"doc_id", $"n_terms", $"score_unats")
      .as[(Long, Long, Long)].collect()
    // df: a->2 (docs 0,10), b->3 (0,10,11), c/x/y -> 1 each
    val s10 = contribUnats(1, 2, 3, 4, 8) + contribUnats(1, 3, 3, 4, 8)
    val s11 = contribUnats(1, 3, 2, 4, 8)
    assert(out.toSeq === Seq((10L, 2L, s10), (11L, 1L, s11)))
  }

  test("query documents never retrieve themselves") {
    val d = docs(0L -> "a b", 1L -> "a b", 10L -> "a b")
    val out = Bm25.bm25TopK(d)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, dd) => q != dd })
    // the two query docs DO retrieve each other (cross, not self)
    assert(out.contains((0L, 1L)) && out.contains((1L, 0L)))
  }

  test("MoreLikeThis selection bounds the query to QueryTerms posting lists") {
    // query doc 0 has QueryTerms + 8 distinct terms; every candidate doc
    // shares ALL of them, so an unbounded probe would report
    // n_terms = QueryTerms + 8 — the bound caps matched terms per pair
    val wide = (0 until Bm25.QueryTerms + 8).map(i => s"t$i").mkString(" ")
    val d = docs(0L -> wide, 10L -> wide, 11L -> wide)
    val nTerms = Bm25.bm25TopK(d).select($"n_terms").as[Long].collect()
    assert(nTerms.nonEmpty)
    assert(nTerms.forall(_ == Bm25.QueryTerms))
  }

  test("rrf fusion: integral arithmetic, 0 for absent, both-lists wins") {
    // corpus where doc 10 is lexically AND vectorially closest to query 0,
    // doc 11 lexical-only (orthogonal vector), doc 12 vector-only (shares
    // no token). Dim-sized one-hot-ish vectors via distinct plane regions.
    def v(base: Int): Array[Float] =
      Array.tabulate(Similarity.Dim)(d => Similarity.planeWeight(base, d).toFloat)
    val d = docs(0L -> "a b", 10L -> "a b", 11L -> "a b q", 12L -> "zz")
    val e = Seq(0L -> v(3), 10L -> v(3), 11L -> v(90), 12L -> v(3))
      .toDF("vec_id", "embedding")
    val out = Bm25.hybridRrf(d, e)
      .filter($"query_id" === 0L)
      .select($"rank", $"doc_id", $"lex_rank", $"vec_rank", $"rrf_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byDoc = out.map(r => r._2 -> r).toMap
    def rrf(lex: Long, vec: Long): Long =
      (if (lex > 0) 1000000L / (Bm25.RrfK + lex) else 0L) +
        (if (vec > 0) 1000000L / (Bm25.RrfK + vec) else 0L)
    // doc 10: in both lists -> fused score is the two integral terms
    val (_, _, lex10, vec10, ppm10) = byDoc(10L)
    assert(lex10 > 0 && vec10 > 0 && ppm10 === rrf(lex10, vec10))
    // doc 12: shares no token -> lexically absent, reported as 0
    val (_, _, lex12, vec12, ppm12) = byDoc(12L)
    assert(lex12 === 0L && vec12 > 0 && ppm12 === rrf(0, vec12))
    // both-systems doc outranks every single-system doc here (its two
    // top-3 terms dominate any one term's reciprocal)
    assert(out.minBy(_._1)._2 === 10L)
  }
}
