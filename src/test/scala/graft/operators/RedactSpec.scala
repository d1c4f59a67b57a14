package graft.operators

import graft.SparkSpec

/** Email redaction: planted addresses are counted and scrubbed, clean text
  * hashes unchanged, probe augmentation targets exactly the residue docs.
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("emails are counted and replaced; clean docs hash to their original text") {
    val docs = Seq(
      (1L, "reach alice.smith+x@sub.example.org or bob@ex.co today"),
      (2L, "no addresses here"),
      (3L, "not-an-email @ example com")).toDF("doc_id", "text")
    val out = TextAnalysis.redactEmails(docs)
      .select($"doc_id", $"n_emails", $"redacted_hash")
      .as[(Long, Long, String)].collect().toMap2
    assert(out(1L)._1 == 2L)
    assert(out(2L)._1 == 0L && out(3L)._1 == 0L)
    // a clean doc's hash equals md5 of its unmodified text
    val cleanMd5 = docs.filter($"doc_id" === 2L)
      .select(org.apache.spark.sql.functions.md5($"text".cast("binary")))
      .as[String].head()
    assert(out(2L)._2 == cleanMd5)
    // the redacted doc's hash equals md5 of the expected scrubbed text
    val expected = Seq("reach [EMAIL] or [EMAIL] today").toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t".cast("binary")))
      .as[String].head()
    assert(out(1L)._2 == expected)
  }

  test("probe augmentation appends a deterministic address to residue docs only") {
    val docs = Seq((13L, "base"), (14L, "other"), (113L, "more"))
      .toDF("doc_id", "text")
    val aug = TextAnalysis.redactProbeAugmented(docs)
      .as[(Long, String)].collect().toMap
    assert(aug(13L) == "base contact user13@example.com")
    assert(aug(113L) == "more contact user113@example.com")
    assert(aug(14L) == "other")
    val counts = TextAnalysis.redactEmails(TextAnalysis.redactProbeAugmented(docs))
      .select($"doc_id", $"n_emails").as[(Long, Long)].collect().toMap
    assert(counts == Map(13L -> 1L, 14L -> 0L, 113L -> 1L))
  }

  implicit class MapOps[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
