package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.HeavyHitters

/** Bounded-state streaming heavy hitters: exact-regime equality with the
  * batch profile across micro-batch boundaries, and the state bound itself
  * (groups x capacity counters, independent of key cardinality).
  */
class StreamingBoundedHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(rows: Seq[Long], chunks: Int, groups: Int,
      capacity: Int): Seq[MgGroupEmit] = {
    implicit val ctx = spark.sqlContext
    val name = s"hh_bounded_spec_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val input = MemoryStream[Long]
    val q = StreamingBoundedHeavyHitters.summaryStream(input.toDS(), groups, capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { slice =>
        input.addData(slice.toIndexedSeq)
        q.processAllAvailable()
      }
      spark.table(name).as[MgGroupEmit].collect().toSeq
    } finally {
      q.stop()
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
    }
  }

  test("exact-regime streaming counters equal the batch profile across batch boundaries") {
    // key i appears i times, shuffled deterministically across 4 batches
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k))
      .sortBy(k => (k * 2654435761L) % 104729L)
    val emissions = runStream(rows, chunks = 4, groups = 4, capacity = 64)
    val finalSeen = emissions.groupBy(_.gid).view.mapValues(_.map(_.seen).max).toMap
    val summaries = emissions
      .filter(e => e.seen == finalSeen(e.gid))
      .map(e => (e.k, e.cnt)).toDF("k", "cnt")
    val got = HeavyHitters.rankSummaries(summaries, "k", 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val expected = HeavyHitters.topKeys(rows.toDF("k"), "k", 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("state and emissions stay capacity-bounded in the decremented regime") {
    // 2000 distinct singleton keys + one hot key, capacity 8 per group:
    // every batch's summary for a group carries at most capacity counters
    val rows = ((1L to 2000L) ++ Seq.fill(500)(0L))
      .sortBy(k => (k * 2654435761L) % 104729L)
    val groups = 4
    val capacity = 8
    val emissions = runStream(rows, chunks = 5, groups = groups, capacity = capacity)
    // per (gid, seen) emission: <= capacity counters + 1 sentinel
    emissions.groupBy(e => (e.gid, e.seen)).foreach { case (_, es) =>
      assert(es.count(_.k.nonEmpty) <= capacity)
      assert(es.count(_.k.isEmpty) == 1)
    }
    // the hot key (500 of 2500 rows > total/(capacity+1)) survives per the
    // Misra-Gries guarantee, with a lower-bound count
    val finalSeen = emissions.groupBy(_.gid).view.mapValues(_.map(_.seen).max).toMap
    val finals = emissions.filter(e => e.seen == finalSeen(e.gid))
    val hot = finals.find(_.k.contains(0L))
    assert(hot.nonEmpty, "hot key evicted despite the MG guarantee")
    assert(hot.get.cnt <= 500L)
    // sentinels carry the exact total even while counters decrement
    assert(finals.filter(_.k.isEmpty).map(_.cnt).sum == rows.length.toLong)
  }
}
