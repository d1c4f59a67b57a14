package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The assembly composite: manifest integrity and stage agreement. */
class AssembleSpec extends SparkSpec {
  import spark.implicits._

  test("the manifest is a 1..N training order over a subset of the cleaned corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val manifest = Assemble.assemble(docs)
      .select($"pos", $"doc_id", $"lang", $"split", $"n_tokens")
      .as[(Long, Long, String, String, Long)].collect()
    assert(manifest.nonEmpty)
    // positions are a contiguous bijection
    assert(manifest.map(_._1).sorted.toSeq == (1L to manifest.length.toLong))
    // every manifest row is a cleaned survivor with identical columns
    val cleaned = CleanCorpus.clean(docs)
      .select($"doc_id", $"lang", $"split", $"n_tokens")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    manifest.foreach { case (_, id, lang, split, nTok) =>
      assert(cleaned.get(id).contains((lang, split, nTok)), s"doc $id")
    }
    // the temperature gate actually sampled (a strict subset survives)
    assert(manifest.length < cleaned.size, s"${manifest.length} of ${cleaned.size}")
  }
}
