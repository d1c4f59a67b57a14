package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Sketches

/** Incremental linear counting: batch equivalence across micro-batch
  * splits, monotone occupancy, and bounded state.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def batchCounts(rows: Seq[(String, Long)]): Map[String, Long] =
    Sketches.approxDistinct(rows.toDF("grp", "v"), "v", "grp")
      .select($"grp", $"n_buckets_hit").as[(String, Long)].collect().toMap

  private def streamCounts(batches: Seq[Seq[BucketHit]]): Map[String, Long] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[BucketHit]
    val q = StreamingSketch.counts(input.toDS())
      .writeStream.format("memory").queryName("sketch_spec")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("sketch_spec").as[SketchCount].collect()
        .groupBy(_.event_type).view.mapValues(_.map(_.n_buckets_hit).max).toMap
    } finally {
      q.stop()
      try spark.catalog.dropTempView("sketch_spec") catch { case _: Exception => () }
    }
  }

  private def hit(g: String, v: Long): BucketHit = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest((Sketches.LinearCountSalt + v).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    BucketHit(g, (java.lang.Long.parseLong(md5.take(15), 16) %
      Sketches.LinearCountBuckets).toInt)
  }

  test("the incremental sketch equals the batch sketch regardless of the batch split") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(_ => (if (rnd.nextBoolean()) "a" else "b",
      rnd.nextInt(300).toLong))
    val expected = batchCounts(rows)
    // one big batch, and a 7-way split with duplicates crossing batches
    val hits = rows.map { case (g, v) => hit(g, v) }
    assert(streamCounts(Seq(hits)) == expected)
    assert(streamCounts(hits.grouped(77).toSeq) == expected)
  }

  test("occupancy is monotone across batches and duplicates never inflate it") {
    val once = (0L until 100L).map(hit("g", _))
    val emitted = {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[BucketHit]
      val q = StreamingSketch.counts(input.toDS())
        .writeStream.format("memory").queryName("sketch_mono")
        .outputMode("update").start()
      try {
        Seq(once.take(50), once, once).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        spark.table("sketch_mono").as[SketchCount].collect().map(_.n_buckets_hit)
      } finally {
        q.stop()
        try spark.catalog.dropTempView("sketch_mono") catch { case _: Exception => () }
      }
    }
    assert(emitted.length == 3)
    assert(emitted.sorted.sameElements(emitted)) // nondecreasing
    assert(emitted(1) == emitted(2)) // replaying the same data moves nothing
  }
}
