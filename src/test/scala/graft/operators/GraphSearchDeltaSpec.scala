package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.Tables

/** Pins the serve-from-maintained-graph composition: beam search over
  * [[KnnGraph.deltaGraph]]'s incrementally maintained edges must equal the
  * search over the full rebuild — row for row, score for score (the
  * maintained graph IS the rebuilt graph by the `ann_knn_graph_delta`
  * contract, so any divergence here is a composition defect: a column
  * mismatch, a precision mix, an edge-frame projection slip).
  */
class GraphSearchDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def collected(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select($"query_id", $"rank", $"vec_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("search over the maintained graph equals search over the rebuild") {
    val served = collected(GraphSearch.searchDeltaEmbeddings(spark, sf0001))
    val rebuilt = collected(GraphSearch.searchEmbeddings(spark, sf0001))
    assert(served.nonEmpty)
    assert(served === rebuilt)
  }

  test("the maintained serve graph itself matches the rebuild at serve density") {
    val emb = Tables.embeddings(spark, sf0001)
    val maintained = KnnGraph.deltaGraph(
      emb.filter(col("vec_id") % CorpusDiff.AddedMod =!= 0),
      emb.filter(col("vec_id") % CorpusDiff.AddedMod === 0),
      GraphSearch.ServeGraphK, GraphSearch.ServeTables, GraphSearch.ServePlanes)
    val rebuilt = KnnGraph.graph(emb, GraphSearch.ServeGraphK,
      GraphSearch.ServeTables, GraphSearch.ServePlanes)
    def rows(df: DataFrame) = df
      .select($"vec_id", $"rank", $"nbr_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(maintained) === rows(rebuilt))
  }
}
