package graft.operators

import graft.SparkSpec

/** PMI collocation semantics: above-chance pairs outrank frequent
  * independent ones, the min-count floor drops rare pairs, and the
  * corpus run is non-vacuous and correctly ordered.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("a bound pair outranks an equally frequent independent pair") {
    // "new york" always co-occurs (5 times); "the cat"/"the dog"/"a cat"/
    // "a dog" mix freely, so each pairing is ~chance within its marginals
    val bound = Seq.fill(5)("new york").mkString(" ")
    val free = Seq("the cat", "the dog", "a cat", "a dog", "the cat",
      "the dog", "a cat", "a dog", "the cat", "a dog").mkString(" ")
    val docs = Seq((1L, bound), (2L, free)).toDF("doc_id", "text")
    val got = Collocations.top(docs)
      .as[(String, String, Long, Long)].collect()
    val pmiOf = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(pmiOf.contains(("new", "york")))
    // every mixed pair that survives the floor scores strictly below
    got.filter(r => r._1 != "new" && r._2 != "new").foreach { r =>
      assert(r._4 < pmiOf(("new", "york")), s"$r not below the bound pair")
    }
  }

  test("pairs under the min-count floor are dropped") {
    // "rare pair" appears once among 5+ repetitions of another pair
    val docs = Seq((1L,
      Seq.fill(6)("alpha beta").mkString(" ") + " rare pair"))
      .toDF("doc_id", "text")
    val got = Collocations.top(docs)
      .as[(String, String, Long, Long)].collect()
    assert(got.forall(_._3 >= Collocations.MinPairCount))
    assert(!got.exists(r => r._1 == "rare" && r._2 == "pair"))
  }

  test("corpus run: k rows, descending pmi, floor respected") {
    val got = Collocations.topDocuments(spark, sf0001)
      .as[(String, String, Long, Long)].collect()
    assert(got.length == Collocations.TopK)
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
    assert(got.forall(_._3 >= Collocations.MinPairCount))
  }
}
