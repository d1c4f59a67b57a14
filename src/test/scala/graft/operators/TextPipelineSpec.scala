package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-assembly operators: stratified sampling and sequence packing. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("sampling rates are honored per language and the verdict is a pure function of doc_id") {
    val corpus = (0L until 2000L).map(i =>
      (i, "some text", if (i % 2 == 0) "en" else "zh"))
    val kept = TextAnalysis.sampleStratified(docs(corpus: _*))
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 1000) // rate 10000bp = keep all
    // zh at 2500bp: binomial(1000, 0.25), 5 sigma ~ 68
    assert(math.abs(byLang("zh") - 250) < 70, byLang)
    // stability under corpus growth: the same ids stay kept in a superset
    val grown = corpus ++ (9000L until 9500L).map(i => (i, "more", "zh"))
    val keptGrown = TextAnalysis.sampleStratified(docs(grown: _*))
      .filter($"doc_id" < 2000).select($"doc_id").as[Long].collect().toSet
    assert(keptGrown == kept.map(_._1).toSet)
  }

  test("vocabTopK counts term and document frequency with a total tie-break order") {
    val corpus = docs(
      (1L, "the cat sat", "en"), (2L, "the the dog", "en"), (3L, "cat and dog", "en"))
    val got = TextAnalysis.vocabTopK(corpus, k = 3)
      .select($"token", $"tf", $"df").as[(String, Long, Long)].collect().toSeq
    // tf: the=3, cat=2, dog=2, and/sat=1; ties at tf=2 break on token asc
    assert(got == Seq(("the", 3L, 2L), ("cat", 2L, 2L), ("dog", 2L, 2L)), got)
  }

  test("the sample is independent of the train/valid/test split (different salts)") {
    val corpus = (0L until 3000L).map(i => (i, "text here", "zh"))
    val sampled = TextAnalysis.sampleStratified(docs(corpus: _*))
      .select($"doc_id").as[Long].collect().toSet
    val splits = TextAnalysis.split(docs(corpus: _*))
      .select($"doc_id", $"split").as[(Long, String)].collect()
    // if the hashes were correlated, sampling would skew the split ratios
    val trainFrac = splits.count(s => sampled(s._1) && s._2 == "train").toDouble /
      math.max(1, splits.count(s => sampled(s._1)))
    assert(math.abs(trainFrac - 0.8) < 0.06, trainFrac)
  }

  test("packing agrees with a sequential driver model and chunks cut exactly at the budget") {
    val corpus = (0L until 200L).map(i =>
      (i, (0 until (3 + (i % 7)).toInt).map(k => s"t$k").mkString(" "), "en"))
    val got = TextAnalysis.packSequences(docs(corpus: _*), budget = 16L, shards = 4)
      .select($"doc_id", $"shard", $"n_tokens", $"chunk_id", $"chunk_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // driver model: same shard assignment, running start per shard
    val starts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    corpus.sortBy(_._1).foreach { case (id, text, _) =>
      val shard = got(id)._2 // shard is content-addressed; reuse it
      val n = text.split(" ").length.toLong
      val start = starts(shard)
      assert(got(id) == ((id, shard, n, start / 16, start % 16)),
        s"doc $id: got ${got(id)}, expected start $start")
      starts(shard) = start + n
    }
    // at least one document straddles a cut (offset + n_tokens > budget):
    // the concat-and-chunk semantic, not per-doc binning
    assert(got.values.exists(r => r._5 + r._3 > 16L))
  }

  test("packing is exact integer math: chunk boundaries reconstruct the running sum") {
    val corpus = (0L until 100L).map(i => (i, "a b c d e", "en"))
    val byShard = TextAnalysis.packSequences(docs(corpus: _*), budget = 7L, shards = 2)
      .select($"shard", $"chunk_id", $"chunk_offset", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    byShard.values.foreach { rows =>
      val total = rows.map(_._4).sum
      val last = rows.maxBy(r => r._2 * 7 + r._3)
      assert(last._2 * 7 + last._3 + last._4 == total)
    }
  }
}
