package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

final case class StreamDoc(ts: Timestamp, doc_id: Long, text: String)

/** Streaming exact dedup: duplicates inside the watermark horizon are
  * dropped at arrival; state is evicted past the horizon (a re-arrival
  * after eviction flows again — the documented horizon-scoped guarantee).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("in-horizon duplicates drop; evicted keys admit re-arrivals") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = StreamingDedup.dedupped(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      // batch 1: the same text twice in one batch -> one survivor
      input.addData(StreamDoc(at("10:00"), 1L, "same text"),
        StreamDoc(at("10:01"), 2L, "same text"),
        StreamDoc(at("10:02"), 3L, "other text"))
      q.processAllAvailable()
      // batch 2: another duplicate within the horizon -> dropped
      input.addData(StreamDoc(at("10:05"), 4L, "same text"))
      q.processAllAvailable()
      val mid = spark.table("stream_dedup").select($"doc_id").as[Long].collect().toSet
      assert(mid == Set(1L, 3L)) // 2 and 4 deduplicated against 1

      // batch 3: jump event time far past the horizon -> state evicts
      input.addData(StreamDoc(at("11:00"), 5L, "unrelated"))
      q.processAllAvailable()
      // batch 4: the old text re-arrives AFTER eviction -> flows again
      input.addData(StreamDoc(at("11:30"), 6L, "same text"))
      q.processAllAvailable()
      val all = spark.table("stream_dedup").select($"doc_id").as[Long].collect().toSet
      assert(all == Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }

  test("driver query: survivor key set equals the batch exact-dedup key set") {
    val streamed = StreamingDedup.exactWithinHorizon(spark, sf0001)
      .as[String].collect().toSeq
    val batch = graft.operators.Dedup
      .exact(graft.sources.Tables.documents(spark, sf0001))
      .select($"content_hash").as[String].collect().toSeq.sorted
    assert(streamed == batch) // same keys, already hash-ordered
  }
}
