package graft.operators

import graft.SparkSpec
import graft.functions.WinnowFingerprints
import org.apache.spark.sql.functions.col

/** Winnowing invariants: the guarantee (a shared >= w+k-1-word passage
  * yields a shared fingerprint), position robustness (prefix shifts keep
  * the shared passage's fingerprints), compression vs the full gram set,
  * and degenerate-input mirroring.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._
  import Winnow.{ShingleK, WindowW}

  private def fpsOf(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFingerprints(col("text"), ShingleK, WindowW).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap

  test("a shared passage of w+k-1 words yields at least one shared fingerprint") {
    // the guarantee threshold is 4 + 3 - 1 = 6 words
    val passage = "alpha bravo charlie delta echo foxtrot"
    val m = fpsOf(
      1L -> s"one two three $passage nine ten eleven",
      2L -> s"zz yy $passage xx ww vv uu tt")
    assert(m(1L).toSet.intersect(m(2L).toSet).nonEmpty)
  }

  test("fingerprints are position-robust: a pure prefix shift preserves them") {
    val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val m = fpsOf(1L -> body, 2L -> s"pre1 pre2 pre3 pre4 $body")
    // every fingerprint of the unshifted doc that comes from the shared body
    // must appear in the shifted doc (its windows over the body are a subset)
    assert(m(1L).toSet.subsetOf(m(2L).toSet))
  }

  test("fingerprint count is compressed vs the gram count; sorted distinct") {
    val words = (1 to 200).map(i => s"w${i % 97}x$i").mkString(" ")
    val out = Winnow.fingerprints(Seq((1L, words)).toDF("doc_id", "text"))
      .as[(Long, Long, Int, String)].collect().head
    val (_, nGrams, nFps, _) = out
    assert(nGrams == 198)
    assert(nFps > 0 && nFps < nGrams / 2) // ~2/(w+1) = 0.4 expected density
    val fps = fpsOf(1L -> words)(1L)
    assert(fps == fps.distinct.sorted)
  }

  test("sharedPassages surfaces an UNALIGNED shared passage that the chunk grid misses") {
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    // doc 2 shifts the passage by one word — aligned fixed-width chunks
    // (dedup_passage) see different chunk hashes; winnowing still collides
    val in = Seq(
      (1L, s"$passage tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8"),
      (2L, s"pre $passage tailA tailB tailC tailD tailE tailF tailG")).toDF("doc_id", "text")
    val shared = Winnow.sharedPassages(in).as[(Long, Long, Long)].collect()
    assert(shared.nonEmpty)
    assert(shared.forall { case (_, nDocs, firstDoc) => nDocs == 2 && firstDoc == 1L })
    val aligned = Dedup.passageDups(in).collect()
    assert(aligned.isEmpty) // the fixed grid misses the 1-word shift
  }

  test("degenerate docs: under k tokens -> no fingerprints; under w grams -> the global min") {
    val m = fpsOf(1L -> "one two", 2L -> "one two three four")
    assert(m(1L).isEmpty)
    assert(m(2L).length == 1) // 2 grams < w=4 windows -> single global min
  }
}
