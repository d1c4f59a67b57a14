package graft.operators

import graft.SparkSpec

/** Snapshot diff: every status branch, null-safety, and the carve rules. */
class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def statuses(old: org.apache.spark.sql.DataFrame,
      neu: org.apache.spark.sql.DataFrame): Map[Long, String] =
    CorpusDiff.diff(old, neu).as[(Long, String)].collect().toMap

  test("all four statuses classify correctly") {
    val old = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val neu = snap(2L -> "b", 3L -> "C!", 4L -> "d")
    val got = statuses(old, neu)
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), got)
  }

  test("null text on both sides compares null-safely as unchanged") {
    val got = statuses(snap(1L -> null), snap(1L -> null))
    assert(got == Map(1L -> "unchanged"), got)
  }

  test("null-to-text and text-to-null are changes, not adds") {
    val got = statuses(snap(1L -> null, 2L -> "x"), snap(1L -> "x", 2L -> null))
    assert(got == Map(1L -> "changed", 2L -> "changed"), got)
  }

  test("delta dedup flags new content that duplicates a DIFFERENT old doc") {
    val old = snap(1L -> "alpha", 2L -> "beta")
    // 10 is added with old doc 1's content (mirror); 11 added novel;
    // 2 changed to old doc 1's content (cross-doc dup via change)
    val neu = snap(1L -> "alpha", 2L -> "alpha", 10L -> "alpha", 11L -> "new!")
    val got = CorpusDiff.deltaDedup(old, neu)
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      2L -> (("changed", false)),
      10L -> (("added", false)),
      11L -> (("added", true))), got)
  }

  test("the carved snapshots exercise every branch on a dense id range") {
    val docs = (0L until 600L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    val got = CorpusDiff
      .diff(CorpusDiff.oldSnapshot(docs), CorpusDiff.newSnapshot(docs))
      .groupBy($"status").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"), got)
    // added = multiples of 17 still present in new; removed = %23==1 ids
    // that were in old; spot the exact counts on the dense range
    val added = (0L until 600L).count(i => i % 17 == 0 && i % 23 != 1)
    val removed = (0L until 600L).count(i => i % 23 == 1 && i % 17 != 0)
    assert(got("added") == added && got("removed") == removed, got)
  }
}
