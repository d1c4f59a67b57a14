package graft.operators

import java.security.MessageDigest

import scala.util.Random

import graft.SparkSpec

/** Seeded-random model check for the fused clean pipeline: an INDEPENDENT
  * plain-Scala reimplementation of the whole chain (marker-count language
  * ID, three-factor quality, md5 dedup, hash-bucket split) run against
  * random corpora — the MqttPropertiesSpec pattern applied to the composite
  * operator. Any divergence between the Spark expressions and this model
  * (tokenization edge, rounding boundary, tie-break, split bucket) fails
  * loudly on inputs nobody hand-picked.
  */
class CleanCorpusPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // --- the independent model ---

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val markers = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "),
    "zh" -> Seq("的", "是", "了"))
  private val langOrder = Seq("en", "de", "fr", "es", "zh")

  private def countOcc(hay: String, needle: String): Int =
    (hay.length - hay.replace(needle, "").length) / needle.length

  private def langPredict(text: String): String = {
    val padded = " " + text + " "
    val scores = langOrder.map(l => l -> markers(l).map(countOcc(padded, _)).sum)
    val total = scores.map(_._2).sum
    val best = scores.map(_._2).max
    if (total <= 0) "und" else scores.find(_._2 == best).get._1
  }

  private def nTokens(text: String): Int = {
    // Spark split(trim(text), " +") — spaces only; empty string yields [""]
    val t = text.replaceAll("^ +| +$", "")
    t.split(" +", -1).length
  }

  private def quality(text: String): Double = {
    val nTok = nTokens(text).toDouble
    val padded = " " + text + " "
    val stop = Seq(" the ", " a ", " and ", " of ", " to ")
      .map(countOcc(padded, _)).sum.toDouble
    val alpha = text.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toDouble
    val lenF = math.min(nTok / 64.0, 1.0)
    val stopF = math.min(stop / math.max(nTok, 1.0) * 10.0, 1.0)
    val alphaF = alpha / math.max(text.length.toDouble, 1.0)
    BigDecimal(lenF * 0.4 + stopF * 0.3 + alphaF * 0.3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def split(docId: Long): String = {
    val bucket = java.lang.Long.parseLong(md5hex(docId.toString).take(15), 16) % 100
    if (bucket < 80) "train" else if (bucket < 90) "valid" else "test"
  }

  private def model(docs: Seq[(Long, String, String)]): Seq[(Long, String, Double, Long, Long, String)] =
    docs
      .filter { case (_, text, lang) => langPredict(text) == lang }
      .map { case (id, text, lang) => (id, text, lang, quality(text)) }
      .filter(_._4 >= CleanCorpus.QualityMin)
      .groupBy { case (_, text, _, _) =>
        md5hex(text.replaceAll("^ +| +$", ""))
      }
      .values.map { group =>
        val keep = group.minBy(_._1)
        (keep._1, keep._3, keep._4, nTokens(keep._2).toLong,
          group.size.toLong, split(keep._1))
      }
      .toSeq.sortBy(_._1)

  // --- the random corpus generator ---

  private def corpus(seed: Long, n: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    val fillers = Seq("alpha", "bravo", "charlie", "data", "42", "x9", "käse", "")
    val markerWords = Seq("the", "and", "of", "der", "und", "die", "le", "et",
      "les", "el", "y", "los", "a", "to", "的", "是")
    val langs = Seq("en", "de", "fr", "es", "zh", "und")
    val base = (1 to n).map { i =>
      val len = rnd.nextInt(120)
      val words = Seq.fill(len)(
        if (rnd.nextBoolean()) markerWords(rnd.nextInt(markerWords.length))
        else fillers(rnd.nextInt(fillers.length)))
      (i.toLong, words.mkString(" "), langs(rnd.nextInt(langs.length)))
    }
    // inject exact and whitespace-variant duplicates under fresh ids
    val dups = base.take(n / 4).zipWithIndex.map { case ((_, text, lang), j) =>
      val altered = if (j % 2 == 0) text else s"  $text "
      ((n + j + 1).toLong, altered, lang)
    }
    base ++ dups
  }

  test("the fused pipeline equals the independent model on seeded random corpora") {
    Seq(7L, 99L, 2026L).foreach { seed =>
      val docs = corpus(seed, 60)
      val got = CleanCorpus.clean(docs.toDF("doc_id", "text", "lang"))
        .as[(Long, String, Double, Long, Long, String)].collect().toSeq
      val want = model(docs)
      assert(want.nonEmpty, s"seed $seed produced a vacuous (empty) kept set")
      assert(got == want, s"seed $seed diverged\nspark: $got\nmodel: $want")
    }
  }
}
