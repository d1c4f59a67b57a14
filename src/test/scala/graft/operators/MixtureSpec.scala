package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-derived mixture rebalancing (Mixture.rebalance). */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("over-represented language is downsampled toward target, minority kept whole") {
    // en: 40 docs x 10 tokens = 400; fr: 4 docs x 10 = 40. Equal 200000-ppm
    // targets: rate_en = min(1e6, 0.2 * 440 / 400) = 220000; rate_fr = 1e6.
    val docs = ((1 to 40).map(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en"))
      ++ (41 to 44).map(i => (i.toLong, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10", "fr")))
      .toDF("doc_id", "text", "lang")
    val got = Mixture.rebalance(docs)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val en = got.find(_._1 == "en").get
    val fr = got.find(_._1 == "fr").get
    assert(en._2 == 400L && en._3 == 200000L * 440 / 400)
    assert(fr._2 == 40L && fr._3 == 1000000L && fr._4 == 4L && fr._5 == 40L)
    // en kept strictly between none and all (the coin actually gates)
    assert(en._4 > 0L && en._4 < 40L && en._5 == en._4 * 10L)
  }

  test("keep decision is a pure function of doc_id: partition-order invariant") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val a = Mixture.rebalance(docs).collect().toList
    val b = Mixture.rebalance(docs.repartition(7, col("doc_id"))).collect().toList
    assert(a == b && a.nonEmpty)
  }

  test("on the real corpus en downsamples and every minority language keeps all") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Mixture.rebalance(docs)
      .as[(String, Long, Long, Long, Long)].collect().toList
    val counts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val en = got.find(_._1 == "en").get
    assert(en._3 < 1000000L && en._4 < counts("en"))
    got.filter(_._1 != "en").foreach { r =>
      assert(r._3 == 1000000L && r._4 == counts(r._1), r)
    }
  }
  test("temperature sampling: min language keeps all, rates fall with size, " +
      "output shares compress toward sqrt") {
    import org.apache.spark.sql.functions.col
    val rows = Mixture.temperatureRebalanceDocs(spark, sf0001)
      .select(col("lang"), col("lang_tokens"), col("rate_ppm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val minLang = rows.minBy(_._2)
    assert(minLang._3 == 1000000L, s"min language not kept whole: $minLang")
    // rates are anti-monotone in language size (sqrt(n_min/n) decreases)
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3, s"$a then $b")
      case _ =>
    }
    // each rate is exactly floor(1e6 * sqrt(min/n)) — the IEEE-exact claim
    val minTok = minLang._2.toDouble
    rows.foreach { case (l, n, r) =>
      assert(r == math.floor(1e6 * math.sqrt(minTok / n)).toLong, l)
    }
  }
}
