package graft.operators

import graft.SparkSpec

/** Linear quality classifier: scoring arithmetic, decision boundary,
  * no-hit docs, case folding.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    QualityModel.score(rows.toDF("doc_id", "text"))
      .select($"doc_id", $"score_milli", $"n_tokens", $"accepted")
      .as[(Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("scores sum matched weights per occurrence; unmatched docs score 0") {
    val got = run(
      1L -> "the cat and the dog",   // the(40)*2 + and(35) = 115, 5 tokens
      2L -> "zebra quux")            // no hits
    assert(got(1L) == ((115L, 5L, true)), got)   // 115*1000 >= 5000*5
    assert(got(2L) == ((0L, 2L, false)), got)    // 0 < 5000*2
  }

  test("negative markers push a doc under the threshold") {
    // the(40) + free(-100) + click(-120) = -180 over 5 tokens
    val got = run(1L -> "the free click bait page")
    assert(got(1L)._1 == -180L && !got(1L)._3, got)
  }

  test("the decision is the exact integer boundary, no rounding slack") {
    // 1 token 'the' = 40 milli over 8 tokens: 40000 vs 5000*8 = 40000 -> accept
    val at = run(1L -> "the x1 x2 x3 x4 x5 x6 x7")
    assert(at(1L) == ((40L, 8L, true)), at)
    // over 9 tokens: 40000 < 45000 -> reject
    val under = run(1L -> "the x1 x2 x3 x4 x5 x6 x7 x8")
    assert(under(1L) == ((40L, 9L, false)), under)
  }

  test("matching folds case: THE and The hit the weight table") {
    val got = run(1L -> "THE The the")
    assert(got(1L)._1 == 120L, got)
  }

  test("empty-ish text neither crashes nor divides") {
    val got = run(1L -> "", 2L -> "   ")
    assert(got(1L)._1 == 0L && got(2L)._1 == 0L, got)
  }
}
