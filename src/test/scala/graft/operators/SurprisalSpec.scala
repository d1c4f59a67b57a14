package graft.operators

import graft.SparkSpec

/** Unigram surprisal: the scoring arithmetic against hand-computed values,
  * rarity ordering, and edge docs.
  */
class SurprisalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Surprisal.score(rows.toDF("doc_id", "text"))
      .select($"doc_id", $"n_tokens", $"surprisal_micro")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("scores match the definition computed by hand") {
    // corpus: "a a b" + "a" -> N = 4, tf(a) = 3, tf(b) = 1
    val sA = math.floor(math.log(4.0 / 3) * 1e6).toLong
    val sB = math.floor(math.log(4.0 / 1) * 1e6).toLong
    val got = run(1L -> "a a b", 2L -> "a")
    assert(got(1L) == ((3L, 2 * sA + sB)), got)
    assert(got(2L) == ((1L, sA)), got)
  }

  test("a doc of corpus-rare tokens outscores a doc of common ones, per token") {
    val rows = (0L until 50L).map(i => i -> "the the the the") :+
      (100L -> "zyx wvu tsr qpo")
    val got = run(rows: _*)
    val commonPerTok = got(0L)._2 / got(0L)._1
    val rarePerTok = got(100L)._2 / got(100L)._1
    assert(rarePerTok > commonPerTok,
      s"rare $rarePerTok <= common $commonPerTok")
  }

  test("token-less and case-folded docs behave") {
    val got = run(1L -> "", 2L -> "   ", 3L -> "THE the The")
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 0L)), got)
    // all three fold to one token with tf 3 in a 3-token corpus: ln(1) = 0
    assert(got(3L) == ((3L, 0L)), got)
  }
}
