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

  test("resize fits into the box aspect-preserving, never upscales, batch-invariant") {
    val out = Multimodal.resizeStub(media, maxW = 224, maxH = 224, batchSize = 9)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= 224 && oh <= 224, s"doc $id resized to $ow x $oh")
      assert(ow <= w && oh <= h, s"doc $id upscaled")
      // aspect preserved to integer-rounding: ow/oh within 1 step of w/h ratio
      assert(math.abs(ow.toLong * h - oh.toLong * w) <= w + h, s"doc $id aspect broken")
    }
    val b = Multimodal.resizeStub(media, maxW = 224, maxH = 224, batchSize = 64)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("embed stub: dims cover the text exactly (chunk boundaries partition the string)") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Multimodal.embedStub(docs).as[(Long, Int, Long)].collect()
    assert(out.length == 3 * 8)
    assert(out.forall { case (_, _, f) => f >= 0 && f < 256 })
    // boundary model: chunk i of "abcdefghij" (len 10) is [i*10/8, (i+1)*10/8)
    val chunks = (0 until 8).map { i =>
      val lo = i * 10 / 8; val hi = (i + 1) * 10 / 8
      "abcdefghij".substring(lo, hi)
    }
    assert(chunks.mkString == "abcdefghij") // exact partition, no gaps/overlap
  }
}
