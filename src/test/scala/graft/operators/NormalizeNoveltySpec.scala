package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Canonical normalization + corpus-bigram novelty. */
class NormalizeNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("normalize case-folds ASCII, scrubs punctuation, collapses whitespace") {
    val got = TextAnalysis.normalize(docs(
      (1L, "  Hello,   WORLD!! 42 "),
      (2L, "hello world 42"),
      (3L, "héllo—world"), // non-ASCII codepoints scrub to separators
      (4L, "")))
      .orderBy($"doc_id")
      .select($"doc_id", $"norm_hash", $"n_chars_norm", $"n_tokens_norm")
      .as[(Long, String, Int, Int)].collect().toSeq
    // doc 1 and 2 canonicalize to the SAME form "hello world 42"
    assert(got(0)._2 == got(1)._2)
    assert(got(0)._3 == "hello world 42".length && got(0)._4 == 3)
    // "héllo—world" -> "h llo world" -> collapsed "h llo world"
    assert(got(2)._3 == "h llo world".length && got(2)._4 == 3)
    // empty stays empty; the canonical hash of "" is stable
    assert(got(3)._3 == 0)
  }

  test("normalization is idempotent (normalizing a canonical form is a no-op)") {
    val corpus = docs((1L, "The QUICK brown-fox; jumps!"), (2L, "a  b   c"))
    val once = TextAnalysis.normalize(corpus)
      .select($"doc_id", $"norm_hash").as[(Long, String)].collect().toMap
    // rebuild the canonical text the same way and re-normalize it
    val canonical = corpus.select($"doc_id",
      trim(regexp_replace(regexp_replace(
        translate($"text", "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"),
        "[^a-z0-9 ]", " "), " +", " ")).as("text"))
    val twice = TextAnalysis.normalize(canonical)
      .select($"doc_id", $"norm_hash").as[(Long, String)].collect().toMap
    assert(once == twice)
  }

  test("bigram novelty matches a driver model and zero-fills short docs") {
    // "a b" appears in docs 1,2,3 (df=3 -> common at minDf=3);
    // every other bigram has df<=2
    val corpus = docs(
      (1L, "a b c"), // bigrams: "a b"(common), "b c" -> 1/2 common
      (2L, "a b d"), // "a b"(common), "b d"        -> 1/2 common
      (3L, "x a b"), // "x a", "a b"(common)        -> 1/2 common
      (4L, "p q"), // "p q"                        -> 0/1 common
      (5L, "solo")) // < 2 tokens                  -> zero-filled
    val got = TextAnalysis.bigramNovelty(corpus)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_bigrams", $"n_common", $"common_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 500000L),
      (2L, 2L, 1L, 500000L),
      (3L, 2L, 1L, 500000L),
      (4L, 1L, 0L, 0L),
      (5L, 0L, 0L, 0L)), got)
  }

  test("repeated bigrams inside one document count once toward df and the doc's set") {
    // "a b a b" has bigrams [a b, b a, a b] -> distinct {a b, b a}
    val corpus = docs((1L, "a b a b"), (2L, "a b"), (3L, "a b x"))
    val got = TextAnalysis.bigramNovelty(corpus, minDf = 3)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_bigrams", $"n_common")
      .as[(Long, Long, Long)].collect().toSeq
    // "a b" df = 3 docs (doc 1 counted ONCE despite two occurrences)
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 2L, 1L)), got)
  }
}
