package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Manifest semantics: corpus conservation, the first-token shard rule,
  * and budget-bounded start offsets.
  */
class ShardManifestSpec extends SparkSpec {

  private lazy val rows = ShardManifest.manifestDocuments(spark, sf0001)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("the manifest conserves documents and tokens") {
    val docs = Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val nTokens = docs
      .select(graft.functions.TextFunctions.nTokens(col("text")).cast("long").as("w"))
      .agg(sum(col("w"))).head().getLong(0)
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._3).sum == nTokens)
  }

  test("start offsets sit inside their shard's budget interval, in order") {
    val b = ShardManifest.ShardTokens
    rows.foreach { case (sid, nd, _, start) =>
      assert(nd >= 1L)
      assert(start >= sid * b && start < (sid + 1) * b, s"shard $sid")
    }
    val ids = rows.map(_._1)
    assert(ids.zip(ids.tail).forall { case (a, c) => a < c })
    assert(rows.length > 1, "budget too large to exercise sharding")
  }
}
