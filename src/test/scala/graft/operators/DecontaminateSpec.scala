package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Benchmark decontamination: planted overlap/no-overlap cases, self-match
  * exclusion, and the broadcast-bench plan shape.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private val benchText = "the quick brown fox jumps over the lazy dog"

  test("docs sharing a shingle with a benchmark doc are flagged; clean docs are not") {
    val corpus = df(
      (1L, s"intro words then $benchText and more"), // contains the bench 3-grams
      (2L, "completely unrelated content with no overlap at all"),
      (3L, "quick brown fox appears here too")) // shares "quick brown fox"
    val bench = df((100L, benchText))
    val got = Decontaminate.contaminated(corpus, bench)
      .select($"doc_id", $"n_bench_docs").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == 1L && got(3L) == 1L)
  }

  test("a corpus doc that IS the benchmark doc does not self-contaminate") {
    val corpus = df((100L, benchText), (2L, "nothing in common here at all"))
    val bench = df((100L, benchText))
    val got = Decontaminate.contaminated(corpus, bench)
      .select($"doc_id").as[Long].collect()
    assert(got.isEmpty) // same doc_id excluded; doc 2 shares nothing
  }

  test("hit counts: n_hit_shingles counts distinct shared shingles, n_bench_docs distinct suites") {
    // corpus doc contains two bench docs' full text -> hits both
    val corpus = df((1L, s"$benchText padded padded $benchText"))
    val bench = df((100L, benchText), (101L, benchText)) // two identical bench docs
    val got = Decontaminate.contaminated(corpus, bench)
      .select($"doc_id", $"n_bench_docs", $"n_hit_shingles")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, nBench, nShingles) = got.head
    assert(nBench == 2L) // both bench ids matched
    assert(nShingles >= 7L) // all shingles of the 9-token bench text
  }

  test("plan broadcasts the benchmark side; corpus never shuffles its postings") {
    val corpus = df((1L, benchText))
    val plan = Decontaminate.contaminated(corpus, df((100L, benchText)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("agrees with the brute-force shingle-intersection model on a seeded random corpus") {
    val rnd = new scala.util.Random(11)
    def doc(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
    val corpus = (0L until 40L).map(i => (i, doc(3 + rnd.nextInt(8))))
    val bench = (100L until 106L).map(i => (i, doc(3 + rnd.nextInt(8))))
    def shingles(text: String): Set[String] =
      text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val model = (for {
      (cid, ctext) <- corpus
      hits = bench.filter { case (bid, btext) =>
        bid != cid && (shingles(ctext) & shingles(btext)).nonEmpty }
      if hits.nonEmpty
    } yield cid -> ((hits.size.toLong,
      shingles(ctext).count(s => hits.exists(h => shingles(h._2).contains(s))).toLong)))
      .toMap
    val got = Decontaminate.contaminated(df(corpus: _*), df(bench: _*))
      .select($"doc_id", $"n_bench_docs", $"n_hit_shingles")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == model)
    assert(model.nonEmpty) // the tiny token pool forces real overlap
  }

  test("self-match suppression is observed, not silent: guarded hits surface as a metric") {
    var observed = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get(Decontaminate.SelfMatchMetric)
          .foreach(row => observed = row.getLong(0))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    // doc 100 collides with bench id 100 (guarded out, counted); doc 1
    // keeps the result non-empty so AQE cannot fold the metric stage away
    val corpus = df((100L, benchText), (1L, s"also has the $benchText inside"))
    def run(bench: DataFrame): Long = {
      observed = -1L
      spark.listenerManager.register(listener)
      try {
        Decontaminate.contaminated(corpus, bench).collect()
        val deadline = System.currentTimeMillis() + 10000
        while (observed < 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        observed
      } finally spark.listenerManager.unregister(listener)
    }
    // colliding id space: every doc-100 shared shingle is guarded out AND counted
    assert(run(df((100L, benchText))) >= 7L) // all shingles of the 9-token bench text
    // disjoint id space (the documented contract): zero — the alarm is quiet
    assert(run(df((999L, benchText))) == 0L)
  }

  test("probe benchmark suite copies every residue-7 doc under collision-proof negative ids") {
    val corpus = df((7L, "a b c d"), (107L, "e f g h"), (12L, "i j k l"))
    val probes = Decontaminate.probeBenchmarks(corpus)
      .as[(Long, String)].collect().toSet
    assert(probes == Set((-8L, "a b c d"), (-108L, "e f g h")))
  }
}
