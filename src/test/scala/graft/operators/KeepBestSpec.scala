package graft.operators

import graft.SparkSpec

/** Quality-ranked duplicate-cluster representative (Dedup.keepBest). */
class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's integer ppm quality, re-derived sequentially. */
  private def qPpm(text: String): Long = {
    val nTok = text.trim.split(" +").count(_.nonEmpty).toLong
    val padded = " " + text + " "
    val stops = Seq(" the ", " a ", " and ", " of ", " to ").map { m =>
      var (c, i) = (0L, padded.indexOf(m))
      while (i >= 0) { c += 1; i = padded.indexOf(m, i + 1) }
      c
    }.sum
    val alpha = text.count(ch => ch.isLetter && ch < 128).toLong
    val lenF = math.min(nTok * 1000000L / 64, 1000000L)
    val stopF = math.min(stops * 10000000L / math.max(nTok, 1L), 1000000L)
    val alphaF = alpha * 1000000L / math.max(text.length.toLong, 1L)
    (lenF * 4 + stopF * 3 + alphaF * 3) / 10
  }

  test("the higher-quality copy of a probe pair survives, per the integer score") {
    // doc_id 7 gains a shouted " !!!" twin via normProbeAugmented; the
    // original has stopword hits the upcased twin loses, so it must win
    val orig = "the cat and the hat went to the store for a new hat today"
    val got = Dedup.keepBest(Seq((7L, orig)).toDF("doc_id", "text"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got.map(r => (r._2, r._3, r._4)) == List((7L, qPpm(orig), 2L)))
    assert(qPpm(orig) > qPpm(orig.toUpperCase + " !!!"))
  }

  test("byte-identical copies tie on quality and the min doc_id wins") {
    val got = Dedup.keepBest(Seq((1L, "x y z"), (2L, "x y z"))
      .toDF("doc_id", "text"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got.map(r => (r._2, r._4)) == List((1L, 2L)))
  }

  test("matches the sequential model on the sf0.001 probe-augmented corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Dedup.keepBest(docs)
      .as[(String, Long, Long, Long)].collect().toList
    val model = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        if (id % 250 == 7) Seq((id, t), (id + 1000000L, t.map(c =>
          if (c >= 'a' && c <= 'z') (c - 32).toChar else c) + " !!!"))
        else Seq((id, t))
      }
      .map { case (id, t) =>
        val canon = t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          .map(c => if (c.isLetterOrDigit && c < 128 || c == ' ') c else ' ')
          .replaceAll(" +", " ").trim
        (canon, id, qPpm(t))
      }
      .groupBy(_._1).values.filter(_.length >= 2)
      .map { g =>
        val best = g.minBy(r => (-r._3, r._2))
        (best._2, best._3, g.length.toLong)
      }.toList
    assert(got.nonEmpty && got.length == model.size)
    assert(got.map(r => (r._2, r._3, r._4)).sorted == model.toList.sorted)
  }
}
