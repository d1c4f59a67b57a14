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

  test("fuzzy containment: ppm arithmetic, band deciles, flag threshold, clean rows") {
    // corpus doc with 16 distinct tokens -> 14 distinct 3-shingles
    val docText = (1 to 16).map(i => s"t$i").mkString(" ")
    val corpus = df((1L, docText))
    val bench = df(
      (-10L, docText),                                    // exact: 14/14
      // partial: first 8 tokens + 8 junk -> 14 item shingles, 6 contained
      (-20L, (1 to 8).map(i => s"t$i").mkString(" ") + " " +
        (1 to 8).map(i => s"j$i").mkString(" ")),
      (-30L, "x1 x2 x3 x4"))                              // clean: 0 hits
    val got = Decontaminate.fuzzyContaminated(corpus, bench)
      .select($"bench_id", $"max_containment_ppm", $"band", $"n_flagged_docs")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (-10L, 1000000L, 10L, 1L),
      (-20L, 428571L, 4L, 0L), // floor(6e6/14) < FlagPpm -> not flagged
      (-30L, 0L, 0L, 0L)))     // clean items surface as band-0 rows
  }

  test("fuzzy containment keeps the worst offender and counts flagged docs per item") {
    val docText = (1 to 16).map(i => s"t$i").mkString(" ")
    // doc 1 contains the item byte-exactly; doc 2 contains ~3/4 of it:
    // tokens t1..t12 -> item shingles fully inside t1..t12 = 10 of 14
    val corpus = df((1L, docText), (2L, (1 to 12).map(i => s"t$i").mkString(" ")))
    val bench = df((-10L, docText))
    val got = Decontaminate.fuzzyContaminated(corpus, bench)
      .select($"max_containment_ppm", $"band", $"n_flagged_docs")
      .as[(Long, Long, Long)].collect().toSeq
    // max over offenders is the exact copy; BOTH docs clear the 0.5 flag
    // (10/14 = 714285 ppm >= FlagPpm)
    assert(got == Seq((1000000L, 10L, 2L)))
  }

  test("fuzzy plan broadcasts the benchmark side like the exact form") {
    val corpus = df((1L, benchText))
    val plan = Decontaminate.fuzzyContaminated(corpus, df((-10L, benchText)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("fuzzy probe suite: four regimes under disjoint guarded negative id spaces") {
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val corpus = df((7L, base), (23L, base), (41L, base), (59L, base))
    val probes = Decontaminate.fuzzyProbeBenchmarks(corpus)
      .as[(Long, String)].collect().toMap
    assert(probes.keySet == Set(-8L, -1000024L, -2000042L, -3000060L))
    assert(probes(-8L) == base)                      // exact copy
    assert(probes(-1000024L) == s"zz $base")         // paraphrase stand-in
    assert(probes(-2000042L).startsWith("w1 w2 w3 w4 w5 w6 w7 w8 uq1"))
    assert(probes(-3000060L).startsWith("cl1"))      // fully synthetic
  }
}
