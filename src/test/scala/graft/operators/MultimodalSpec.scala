package graft.operators

import graft.SparkSpec

/** The multimodal decode contract: schema, batching, determinism,
  * partition-locality, AND value-level exactness (the codec is a
  * deterministic byte-arithmetic stand-in, but its whole output is
  * certified — this spec pins the Scala side against a direct
  * reimplementation; the driver oracle pins it against DuckDB).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    graft.sources.Tables.documents(spark, sf0001))

  test("decode output conforms to the declared schema, 8 rows per media row") {
    val out = Multimodal.decode(media)
    assert(out.schema == Multimodal.decodedSchema)
    assert(out.count() == media.count() * Multimodal.DecodeChunks)
    val rows = out.orderBy($"doc_id", $"chunk").limit(8).collect()
    assert(rows.map(_.getInt(3)).toSeq == (0 until 8))
    assert(rows.forall(r => r.getInt(1) >= 16 && r.getInt(2) >= 16)) // w/h floors
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 256000))
  }

  test("decode features match a direct byte-arithmetic model, odd lengths included") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val got = Multimodal.decode(Multimodal.asMedia(docs))
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(t => (t._1, t._4) -> t._5).toMap
    for ((id, text) <- Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))) {
      val bytes = text.getBytes("UTF-8")
      for (i <- 0 until 8) {
        val lo = i * bytes.length / 8; val hi = (i + 1) * bytes.length / 8
        val want = if (hi > lo)
          bytes.slice(lo, hi).map(_ & 0xff).map(_.toLong).sum * 1000L / (hi - lo)
        else 0L
        assert(got((id, i)) == want, s"doc $id chunk $i")
      }
    }
  }

  test("decode is deterministic and batch-size invariant") {
    val a = Multimodal.decode(media, batchSize = 7)
      .orderBy($"doc_id", $"chunk").collect().map(_.toSeq)
    val b = Multimodal.decode(media, batchSize = 64)
      .orderBy($"doc_id", $"chunk").collect().map(_.toSeq)
    assert(a.sameElements(b)) // batch boundaries must never leak into values
  }

  test("decode runs partition-local: no shuffle in the plan") {
    val plan = Multimodal.decode(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("gate corpora are pure ASCII, so the oracle's char space IS byte space") {
    // decodeSql sums ascii() over CHARACTER positions; the Spark side sums
    // UTF-8 BYTES. Equal iff the corpus is ASCII — asserted, not assumed.
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val bad = graft.sources.Tables.documents(spark, dir)
        .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
        .count()
      assert(bad == 0L, s"$dir has $bad non-ASCII documents")
    }
  }

  test("resize fits into the box aspect-preserving, never upscales, batch-invariant") {
    val out = Multimodal.resize(media, maxW = 224, maxH = 224, batchSize = 9)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= 224 && oh <= 224, s"doc $id resized to $ow x $oh")
      assert(ow <= w && oh <= h, s"doc $id upscaled")
      // aspect preserved to integer-rounding: ow/oh within 1 step of w/h ratio
      assert(math.abs(ow.toLong * h - oh.toLong * w) <= w + h, s"doc $id aspect broken")
    }
    val b = Multimodal.resize(media, maxW = 224, maxH = 224, batchSize = 64)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("embed: dims cover the text exactly (chunk boundaries partition the string)") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Multimodal.embed(docs).as[(Long, Int, Long)].collect()
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
