package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-histogram conservation against the certified edge stage: vector
  * and edge totals must reconcile, zeros included.
  */
class GraphDegreeSpec extends SparkSpec {

  test("the histogram conserves vectors and edges on the sf0.001 corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val hist = GraphDegree.histogram(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nVecs = emb.count()
    val nEdges = KnnGraph.graph(emb).count()
    // every vector lands in exactly one bucket
    assert(hist.values.sum == nVecs)
    // sum(degree * count) is the number of directed edges
    assert(hist.map { case (d, n) => d * n }.sum == nEdges)
    // the LSH graph is sparse: some vectors are nobody's neighbor
    assert(hist.getOrElse(0L, 0L) > 0L)
  }

  test("in-degree matches a direct per-vector count, zeros included") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 60)
    val direct = KnnGraph.graph(emb)
      .groupBy(col("nbr_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val degreeOf = emb.select(col("vec_id")).collect()
      .map(r => direct.getOrElse(r.getLong(0), 0L))
    val expected = degreeOf.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val hist = GraphDegree.histogram(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == expected)
  }
}
