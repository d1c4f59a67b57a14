package graft.operators

import graft.SparkSpec

/** Balance-report semantics: per-table row conservation, the 2^P bucket
  * ceiling, and mean ≤ max.
  */
class LshBalanceSpec extends SparkSpec {
  import spark.implicits._

  test("the report conserves rows and bounds occupancy per table") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val got = LshBalance.reportEmbeddings(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (0L until Similarity.TopKTables))
    got.foreach { r =>
      assert(r._3 == n) // every vector lands in exactly one bucket per table
      assert(r._2 >= 1 && r._2 <= (1L << Similarity.TopKPlanes))
      assert(r._5 <= r._4 && r._4 <= n)
    }
  }
}
