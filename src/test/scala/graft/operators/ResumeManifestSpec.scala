package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** Semantics pins for [[ShardManifest.resumeManifest]]: the manifest is
  * exactly the training-order suffix from the half-mass resume point —
  * the straddling document (and only it) carries a positive seek, and the
  * post-seek token mass reconciles to total - R exactly.
  */
class ResumeManifestSpec extends SparkSpec {

  test("resume manifest is the exact training-order suffix with one seek") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val total = docs
      .select(sum(TF.nTokens(col("text")).cast("long"))).head().getLong(0)
    val resumeAt = total / 2
    val got = ShardManifest.resumeManifest(docs)
      .join(docs.select(col("doc_id"),
        TF.nTokens(col("text")).cast("long").as("n_tokens")), Seq("doc_id"))
      .select("doc_id", "shard_id", "start_offset", "skip_tokens", "n_tokens")
      .orderBy("start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    // contiguous training-order suffix: offsets chain doc-to-doc
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 == a._3 + a._5)
      case _ => ()
    }
    // only the first (straddling) doc seeks, and it seeks to R exactly
    val head = got.head
    assert(head._3 <= resumeAt && head._3 + head._5 > resumeAt)
    assert(head._4 == resumeAt - head._3)
    assert(got.tail.forall(_._4 == 0L))
    // post-seek token mass is exactly the unconsumed half
    assert(got.map(_._5).sum - head._4 == total - resumeAt)
    // shard ids agree with the shard manifest's boundaries
    got.foreach { case (_, shard, off, _, _) =>
      assert(shard == off / ShardManifest.ShardTokens)
    }
  }
}
