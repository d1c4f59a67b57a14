package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** Schedule semantics: span tiling, the tail-span token count, the
  * zero-token document, and the empirical mask rate.
  */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  test("tiling and tail spans are exact on a hand-checked input") {
    // 7 tokens -> spans of 3: [3, 3, 1]. (nTokens("") is 1 under the
    // shared split convention, so no zero-span documents exist.)
    val docs = Seq((1L, "a b c d e f g"), (2L, "x")).toDF("doc_id", "text")
    val got = SpanCorruption.schedule(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n, spans, mSpans, mToks, ppm) = got(1L)
    assert(n == 7 && spans == 3)
    // recompute the draws with the shared hash to pin the masked set
    val draws = (0L until 3L).map { s =>
      spark.range(1).select(
        pmod(TF.hash60(concat(lit(SpanCorruption.SpanSalt), lit("1"),
          lit(":"), lit(s.toString))), lit(1000L)).as[Long]).head()
    }
    val expectSpans = draws.count(_ < SpanCorruption.MaskPerMille)
    val spanToks = Seq(3L, 3L, 1L)
    val expectToks = draws.zip(spanToks)
      .collect { case (d, t) if d < SpanCorruption.MaskPerMille => t }.sum
    assert(mSpans == expectSpans && mToks == expectToks)
    assert(ppm == expectToks * 1000000L / 7)
    // the one-token doc: one span of one token, drawn with its own salt
    val d2 = spark.range(1).select(
      pmod(TF.hash60(concat(lit(SpanCorruption.SpanSalt), lit("2"),
        lit(":"), lit("0"))), lit(1000L)).as[Long]).head()
    val m2 = if (d2 < SpanCorruption.MaskPerMille) 1L else 0L
    assert(got(2L) == ((2L, 1L, 1L, m2, m2, m2 * 1000000L)))
  }

  test("the driver schedule is total and masks near the target rate") {
    val df = SpanCorruption.scheduleDocuments(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(df.length == 500)
    val tokens = df.map(_._2).sum
    val masked = df.map(_._5).sum
    val rate = masked.toDouble / tokens
    // 15% +- 5% absolute over ~27k tokens
    assert(rate > 0.10 && rate < 0.20, s"rate $rate")
    df.foreach { r => assert(r._4 <= r._3 && r._5 <= r._2) }
  }
}
