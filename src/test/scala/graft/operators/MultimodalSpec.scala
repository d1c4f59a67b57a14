package graft.operators

import graft.SparkSpec

/** The multimodal decode PLUMBING contract (the decode itself is a declared
  * stub — no codecs in this container): schema, batching, determinism, and
  * partition-locality are the parts a real codec would inherit.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    graft.sources.Tables.documents(spark, sf0001))

  test("decode output conforms to the declared schema, one row per media row") {
    val out = Multimodal.decodeStub(media)
    assert(out.schema == Multimodal.decodedSchema)
    assert(out.count() == media.count())
    val row = out.orderBy($"doc_id").first()
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == 8)
    assert(row.getInt(1) >= 16 && row.getInt(2) >= 16) // width/height floors
  }

  test("decode is deterministic and batch-size invariant") {
    val a = Multimodal.decodeStub(media, batchSize = 7)
      .orderBy($"doc_id").collect().map(_.toSeq)
    val b = Multimodal.decodeStub(media, batchSize = 64)
      .orderBy($"doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b)) // batch boundaries must never leak into values
  }

  test("decode runs partition-local: no shuffle in the plan") {
    val plan = Multimodal.decodeStub(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
