package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The shared replay harness of the update-mode aggregation twins
  * ([[StreamingSketch]], [[StreamingQuantiles]], [[StreamingHeavyHitters]],
  * [[StreamingCleanCorpus]]): stream `rows` through `agg` in `chunks`
  * micro-batches via a MemoryStream and an update-mode memory sink, and
  * return EVERY emitted row. One implementation owns the shared mechanics —
  * unique sink naming, state-store partition sizing with conf restore (the
  * StreamingHistory rule: size the stateful shuffle to the keyspace, not
  * the session default), stream stop and temp-view cleanup on all paths —
  * so a fix applies once, not four times.
  *
  * Callers fold the emissions to the final state: update-mode aggregates
  * here are MONOTONE (counts nondecreasing, min nonincreasing), so the
  * final value per key is the row max/min — batch-order-independent.
  */
private[streaming] object ReplayHarness {

  def updateModeEmissions[T](spark: SparkSession, rows: Seq[T], chunks: Int,
      statePartitions: Int, prefix: String)(agg: Dataset[T] => DataFrame)(
      implicit enc: Encoder[T]): DataFrame = {
    implicit val ctx = spark.sqlContext
    val name = s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val input = MemoryStream[T]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val q = try {
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      agg(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { slice =>
        input.addData(slice)
        q.processAllAvailable()
      }
      val table = spark.table(name)
      spark.createDataFrame(
        java.util.Arrays.asList(table.collect(): _*), table.schema)
    } finally {
      q.stop()
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
    }
  }
}
