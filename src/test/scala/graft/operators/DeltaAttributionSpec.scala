package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Pins the delta-cascade contract on a constructed corpus: priority (an
  * exact copy is also caught by every weaker screen but reports 'exact'),
  * and each probe construction landing in exactly its designed stage —
  * including the token-permuted doc that ONLY the simhash screen can see.
  */
class DeltaAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  test("cascade priority and per-construction stages") {
    val a = (1 to 14).map(i => s"w$i").mkString(" ")
    val old = docs(10L -> a)
    val probes = docs(
      900L -> a,                                    // exact copy
      901L -> ("zz " + a),                          // one-token edit
      902L -> a.split(" ").reverse.mkString(" "),   // permuted term bag
      903L -> ("fresh framing text here " +        // embedded 6-word quote
        (4 to 9).map(i => s"w$i").mkString(" ") +
        " plus unrelated trailing words entirely"),
      904L -> (1 to 12).map(i => s"q$i").mkString(" ")) // fully new
    val got = DeltaAttribution.attributeDelta(old, probes)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      900L -> "exact",   // also minhash/simhash/winnow-catchable: priority
      901L -> "minhash", // jaccard ~ (n-4)/(n+1) >= 0.5, not byte-exact
      902L -> "simhash", // hamming 0 by term-bag invariance; shingles differ
      903L -> "winnow",  // >= 6-word passage; whole-doc screens miss
      904L -> "unique"))
  }
}
