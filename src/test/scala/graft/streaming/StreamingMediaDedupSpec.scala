package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DedupAttribution
import graft.sources.Tables

/** The streamed media dedup's survivor key set equals the distinct
  * payload-hash set of the augmented corpus at any chunking, and the
  * probe copies provably DROP (the survivor count is strictly below the
  * augmented row count).
  */
class StreamingMediaDedupSpec extends SparkSpec {

  test("survivor key set equals the distinct payload hashes; probes drop") {
    val docs = Tables.documents(spark, sf0001)
    val nAug = docs.count() +
      docs.filter(col("doc_id") % 250 === 3).count()
    val expected = docs.select(md5(encode(col("text"), "UTF-8")).as("h"))
      .distinct().orderBy("h").collect().map(_.getString(0)).toSeq
    Seq(1, 3).foreach { chunks =>
      val got = StreamingDedup.mediaWithinHorizonFromFiles(spark, sf0001, chunks)
        .collect().map(_.getString(0)).toSeq
      // corpus texts are unique, so the distinct set is the corpus's own
      // hashes; every +4e6 probe copy must have been dropped at arrival
      assert(got == expected, s"chunks=$chunks")
      assert(got.size < nAug, "no probe copy was dropped — vacuous")
    }
  }
}
