package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.HeavyHitters
import graft.sources.Tables

/** The UPDATE-MODE aggregation family's streaming certificate WITHOUT
  * driver-side input materialization — the file-source twin of
  * [[StreamingHeavyHitters.hotCustomers]], whose MemoryStream ingest
  * `.collect()`s the orders table to the driver. Here the keyed fact rows
  * are staged DISTRIBUTED via [[FileStage]] and consumed as real
  * micro-batches (`maxFilesPerTrigger = 1`), so the per-key counters are
  * maintained by genuine incremental state updates over partitioned input.
  *
  * Update mode needs none of the append-mode machinery: no watermark, no
  * flush sentinels, no event-time ordering constraint — counters emit
  * every batch they change and are MONOTONE nondecreasing, so the final
  * counter per key is the row max over all emissions regardless of batch
  * boundaries or arrival order. (The range staging on `o_orderkey` is for
  * deterministic chunking only, not a semantic requirement — the one
  * file-replay certificate whose correctness is order-free.)
  *
  * The memory-sink readback is the OUTPUT surface (distinct-key x batch
  * emissions, bounded by the key cardinality — never fact rows); the
  * ranking/share tail ([[HeavyHitters.rankCounts]]) then runs over
  * key-cardinality counters. Oracle: the SAME SQL as the batch
  * `q_heavy_hitters` ([[HeavyHitters.hotCustomersSql]]).
  */
object FileReplayHeavyHitters {

  def hotCustomers(spark: SparkSession, dir: String, chunks: Int = 3): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_file_hh").toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      val staged = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
      FileStage.stage(staged, inDir, chunks, col("o_orderkey"))
      val name = s"hh_file_${java.util.UUID.randomUUID().toString.take(8)}"
      try {
        val q = ReplayHarness.runWithStatePartitions(spark, 8) {
          val stream = spark.readStream
            .schema(staged.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inDir)
          stream.groupBy(col("o_custkey")).count()
            .writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
        }
        try q.awaitTermination() finally q.stop()
        val emissions = spark.table(name)
        val materialized = spark.createDataFrame(
          java.util.Arrays.asList(emissions.collect(): _*), emissions.schema)
        // cumulative counts are monotone: the final counter is the row max
        val counts = materialized
          .groupBy(col("o_custkey"))
          .agg(max(col("count")).as("n_rows"))
        HeavyHitters.rankCounts(counts, "o_custkey", 10)
      } finally {
        try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
