package graft.operators

import graft.SparkSpec

/** Zipf-profile semantics: the string-length decade, rank totality under
  * tf ties, and conservation of types and mass.
  */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  test("decades and bands are exact on a hand-checked input") {
    // 12 distinct tokens: "top" x5, "mid" x2, ten singletons -> ranks:
    // top=1, mid=2, singletons 3..12 (alphabetical tiebreak)
    val text = (("top " * 5) + ("mid " * 2) +
      (0 until 10).map(i => s"w$i").mkString(" ")).trim
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Zipf.decades(docs).as[(Long, Long, Long, Long, Long)].collect()
    // decade 0 = ranks 1..9 (top, mid, 7 singletons); decade 1 = ranks 10..12
    assert(got.toSeq == Seq((0L, 9L, 14L, 5L, 1L), (1L, 3L, 3L, 1L, 1L)))
  }

  test("the driver profile conserves types and token mass") {
    val df = Zipf.decadesDocuments(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(df.length >= 2) // the sf0.001 synthetic vocabulary is <100 types
    assert(df.map(_._1).toSeq == (0L until df.length))
    // decade d holds at most 9*10^d ranks
    df.foreach { r => assert(r._2 <= 9L * math.pow(10, r._1).toLong) }
    // band maxima are nonincreasing across decades (rank order)
    assert(df.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
  }
}
