package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches

/** Incremental histogram quantiles: the streaming twin must equal the batch
  * sketch exactly, for any micro-batch split of the same rows.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("streamed histogram quantiles equal the batch sketch at every chunking") {
    val dir = sf0001
    val batch = Sketches.approxQuantilesByType(spark, dir)
      .orderBy($"event_type")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    Seq(1, 3, 7).foreach { chunks =>
      val streamed = StreamingQuantiles.quantilesByType(spark, dir, chunks)
        .as[(String, Long, Double, Double, Double)].collect().toSeq
      assert(streamed == batch, s"chunks=$chunks")
    }
  }
}
