package graft.operators

import org.apache.spark.sql.functions._

import graft.{SlowTest, SparkSpec}

/** Graph-ANN serve recall pinned against the exact baseline at sf0.1 (the
  * IvfProbeCurveSpec discipline: a serve family ships with its own
  * measured floor, never a transitive one), plus the structural
  * determinism pins at unit scale.
  */
class GraphSearchRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("graph-search recall floor holds at sf0.1", SlowTest) {
    val emb = graft.sources.Tables.embeddings(spark, sf01)
    val exact = pairs(Similarity.bruteForceTopK(emb))
    assert(exact.nonEmpty)
    val graph = (pairs(GraphSearch.search(emb)) & exact).size.toDouble / exact.size
    info(f"sf0.1: graph-search recall@5 = $graph%.3f " +
      s"(beam ${GraphSearch.Beam}, hops ${GraphSearch.Hops}, " +
      s"graphK ${GraphSearch.ServeGraphK})")
    assert(graph >= 0.9, f"graph serve below the 0.9 floor at sf0.1: $graph%.3f")
  }

  test("each hop never reduces beam quality; search is deterministic") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val out1 = GraphSearch.search(emb).collect().map(_.toSeq).toSeq
    val out2 = GraphSearch.search(emb).collect().map(_.toSeq).toSeq
    assert(out1 == out2) // replay-identical: fixed seeds, fixed tie order
    assert(out1.nonEmpty)
    // more hops can only improve or hold the summed beam score (the beam
    // keeps its own nodes as candidates, so a hop's top-B dominates)
    def sumCos(hops: Int): Double =
      GraphSearch.search(emb, hops = hops)
        .agg(sum(col("cos"))).head().getDouble(0)
    val h1 = sumCos(1); val h3 = sumCos(3)
    assert(h3 >= h1 - 1e-9, s"hop 3 beam regressed vs hop 1: $h1 -> $h3")
  }
}
