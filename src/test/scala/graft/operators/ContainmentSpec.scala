package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Asymmetric n-gram containment: the subset-duplicate screen. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a fully-quoted excerpt scores containment 1.0 where jaccard stays low") {
    // doc 2 = the first 5 tokens of doc 1 (doc 1 has 20 tokens): every
    // 3-shingle of doc 2 appears in doc 1
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val short = (1 to 5).map(i => s"w$i").mkString(" ")
    val corpus = docs((1L, long), (2L, short), (3L, "totally different words here"))
    val cont = Dedup.ngramContainment(corpus)
      .select($"doc_a", $"doc_b", $"containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(cont == Seq((1L, 2L, 1.0)))
    // jaccard on the same pair: 3 common shingles / (18 + 3 - 3) = 1/6,
    // far below its 0.4 threshold — the pair is invisible to jaccard
    val jac = Dedup.ngramJaccard(corpus).count()
    assert(jac == 0L)
  }

  test("every probe prefix-twin surfaces with containment 1.0 on the real corpus") {
    val base = Tables.documents(spark, sf0001)
    val probeIds = Dedup.containmentProbeAugmented(base)
      .filter($"doc_id" >= 3000000L).select($"doc_id").as[Long].collect().toSet
    assert(probeIds.nonEmpty)
    val pairs = Dedup.ngramContainment(Dedup.containmentProbeAugmented(base))
      .select($"doc_a", $"doc_b", $"containment")
      .as[(Long, Long, Double)].collect()
    // each probe id pairs with its original (orig = probe - 3e6) at 1.0
    probeIds.foreach { p =>
      val hit = pairs.find(r => r._1 == p - 3000000L && r._2 == p)
      assert(hit.exists(_._3 == 1.0), s"probe $p: $hit")
    }
  }
}
