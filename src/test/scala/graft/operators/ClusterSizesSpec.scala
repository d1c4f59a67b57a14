package graft.operators

import graft.SparkSpec

/** Semantics pins for [[DedupClusters.sizeHistogram]]: hand-checked
  * sizes on a known pair graph, and n_docs conservation against the
  * label frame.
  */
class ClusterSizesSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked histogram on a known component structure") {
    // components: {1,2,3} (chain), {10,11}, {20,21} -> one size-3, two size-2
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val labels = DedupClusters.components(pairs)
    val got = DedupClusters.sizeHistogram(labels)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 4L), (3L, 1L, 3L)))
    assert(got.map(_._3).sum == labels.count())
  }
}
