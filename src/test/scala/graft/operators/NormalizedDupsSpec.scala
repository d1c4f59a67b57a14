package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Canonical-form dedup: catches the case/punctuation variants byte-exact
  * dedup misses, and the probe fixture provably creates them.
  */
class NormalizedDupsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("case/punctuation/whitespace variants collapse to one canonical group") {
    val got = Dedup.normalizedDups(docs(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD!!!"),
      (4L, "goodbye world")))
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (4L, 1L)))
  }

  test("every probe twin lands in its original's canonical group") {
    val base = Tables.documents(spark, sf0001)
    val origs = base.filter($"doc_id" % 250 === 7)
    assert(origs.count() > 0)
    val dups = Dedup.normalizedDups(Dedup.normProbeAugmented(base))
    // every probed original's canonical hash must head a group of >= 2
    // (its shouted twin at minimum; possibly more if originals collide)
    val origHashes = TextAnalysis.normalize(origs)
      .select($"norm_hash").as[String].collect().toSet
    val groupSizes = dups
      .filter($"norm_hash".isin(origHashes.toSeq: _*))
      .select($"norm_hash", $"n_copies").as[(String, Long)].collect().toMap
    assert(groupSizes.keySet == origHashes)
    assert(groupSizes.values.forall(_ >= 2L), groupSizes.filter(_._2 < 2))
  }
}
