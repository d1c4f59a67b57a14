package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.Tables

/** Pins refresh ≡ rebuild for the incremental posting-index maintenance
  * ([[Bm25.bm25DeltaTopK]]): score-level EXACT equality (micro-nats are
  * integral, so equality is checkable bit-for-bit), the displacement case
  * (a delta doc that must enter a query's top-k and push an old doc out),
  * and the stat-refresh case (delta docs shift df/N/total_len enough to
  * change OLD docs' scores — the refresh must reprice frozen postings with
  * the merged stats, not serve stale scores).
  */
class Bm25DeltaSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def collected(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select($"query_id", $"rank", $"doc_id", $"n_terms", $"score_unats")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("refresh equals rebuild exactly on the driver carve at sf0.001") {
    val full = Tables.documents(spark, sf0001)
    val old = full.filter(col("doc_id") % CorpusDiff.AddedMod =!= 0)
    val delta = full.filter(col("doc_id") % CorpusDiff.AddedMod === 0)
    assert(collected(Bm25.bm25DeltaTopK(old, delta)) ===
      collected(Bm25.bm25TopK(full)))
  }

  test("a delta document displaces an old document from the top-k") {
    // query doc 0 = "a b"; old corpus has exactly k weak matches (one term
    // each); the delta doc 50 matches BOTH terms — the refresh must rank it
    // first and push the weakest old doc out of the top-k
    val old = docs((0L -> "a b") +: (10L to 14L).map(i => i -> s"a filler$i"): _*)
    val delta = docs(50L -> "a b")
    val refreshed = collected(Bm25.bm25DeltaTopK(old, delta, k = 5))
    val rebuilt = collected(Bm25.bm25TopK(docs(
      (0L -> "a b") +: (50L -> "a b") +: (10L to 14L).map(i => i -> s"a filler$i"): _*), k = 5))
    assert(refreshed === rebuilt)
    val top = refreshed.filter(r => r._1 == 0L && r._2 == 1L)
    assert(top.map(_._3) === Seq(50L), "the delta doc must take rank 1")
    assert(refreshed.count(_._1 == 0L) == 5)
  }

  test("delta docs reprice OLD docs (df/N/total_len refresh, not stale stats)") {
    // the delta floods term "a" (df jumps), so old doc 10's score for the
    // query's "a" posting must DROP relative to the frozen-stats serve —
    // equality with the rebuild proves the stats were refreshed
    val old = docs(0L -> "a b", 10L -> "a b")
    val delta = docs((20L to 29L).map(i => i -> "a a a"): _*)
    val refreshed = collected(Bm25.bm25DeltaTopK(old, delta))
    val rebuilt = collected(Bm25.bm25TopK(docs(
      (0L -> "a b") +: (10L -> "a b") +: (20L to 29L).map(i => i -> "a a a"): _*)))
    assert(refreshed === rebuilt)
    val staleServe = collected(Bm25.bm25TopK(old))
    val score10Refreshed = refreshed.find(r => r._1 == 0L && r._3 == 10L).get._5
    val score10Stale = staleServe.find(r => r._1 == 0L && r._3 == 10L).get._5
    assert(score10Refreshed != score10Stale,
      "merged stats must change the old doc's score in this fixture")
  }

  test("query documents arriving IN the delta are served") {
    // the whole query set rides the delta side (doc_id < QueryCount are all
    // new): qtf spans the merge, so the refresh must still stage its plans
    val old = docs(10L -> "a b c", 11L -> "a x y")
    val delta = docs(0L -> "a b")
    val refreshed = collected(Bm25.bm25DeltaTopK(old, delta))
    val rebuilt = collected(Bm25.bm25TopK(docs(
      0L -> "a b", 10L -> "a b c", 11L -> "a x y")))
    assert(refreshed === rebuilt)
    assert(refreshed.nonEmpty && refreshed.forall(_._1 == 0L))
  }
}
