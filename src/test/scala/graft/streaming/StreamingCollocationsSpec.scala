package graft.streaming

import graft.SparkSpec
import graft.operators.{BigramSurprisal, Collocations}

/** Streaming collocation twin: the per-row pair spelling matches the
  * batch window spelling pair-for-pair, and the replayed report equals
  * the batch report.
  */
class StreamingCollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("per-row pair spelling == the batch lead()-window spelling") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val perRow = StreamingCollocations.pairsOf(docs)
      .groupBy("w1", "w2").count().as[(String, String, Long)].collect().toSet
    val windowed = BigramSurprisal.bigrams(docs)
      .groupBy("w1", "w2").count().as[(String, String, Long)].collect().toSet
    assert(perRow == windowed)
  }

  test("empty and single-token docs contribute no pairs") {
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = StreamingCollocations.pairsOf(docs)
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("a", "b")))
  }

  test("replayed report equals the batch report") {
    val batch = Collocations.topDocuments(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSeq
    val streamed = StreamingCollocations.topFromFiles(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }
}
