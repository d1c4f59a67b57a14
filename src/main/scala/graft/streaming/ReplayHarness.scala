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

  /** Start a streaming query with `spark.sql.shuffle.partitions` set to
    * `statePartitions` (the StreamingHistory rule: size the stateful
    * shuffle — which FREEZES into the checkpoint as the state-store
    * partition count — to the keyspace, not the session default), restoring
    * the session value once `start` returns the running query.
    *
    * LOAD-BEARING ASSUMPTION, documented here because every file twin rides
    * on it: `DataStreamWriter.start()` constructs the `StreamExecution`
    * SYNCHRONOUSLY, and the execution clones the session (and with it the
    * SQL conf) at construction — so the conf restore in this method's
    * `finally` cannot race the running stream; the stream keeps the
    * `statePartitions` value for its whole life while the caller's session
    * is already back to its default. `StreamingConfCaptureSpec` pins the
    * behavior against Spark upgrades: if a Spark version ever deferred the
    * clone past `start()`, that spec (a stream started under an altered
    * conf, restored immediately, asserting the stream kept the altered
    * value) is the tripwire. Every start-a-stream-with-sized-state site
    * must route through here rather than re-implementing the
    * save/set/restore dance.
    */
  /** Serializes the conf-set/start/conf-restore dance so INDEPENDENT twins
    * may start their streams from concurrent threads (the r21
    * [[StreamingHybrid]] leg overlap): without the lock, two threads
    * interleaving set/restore can capture each other's altered value and
    * leave the session conf wrong after both finish. Only `start` holds the
    * lock — the streams themselves (and `awaitTermination`) run unlocked,
    * which is where the overlap pays.
    */
  private val confLock = new Object

  def runWithStatePartitions(spark: SparkSession, statePartitions: Int)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = confLock.synchronized {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      start
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The driver-free counterpart of [[updateModeEmissions]]: the replay
    * frame is staged DISTRIBUTED via [[FileStage]] (range-ordered parquet
    * chunks, one REAL micro-batch per file) instead of collected into a
    * MemoryStream, so no input row ever visits the driver. Shared by every
    * `*_streaming_file` twin; `agg` receives the raw file-source frame
    * (callers re-type with `.as[T]` where their agg is typed). Append-mode
    * users (dedup / winnow key sets) emit on ARRIVAL — first-seen rows
    * pass `dropDuplicatesWithinWatermark` immediately; the watermark only
    * EVICTS — so unlike windowed/session aggregation no flush sentinel is
    * needed. The memory-sink readback (materialized before the staging dir
    * is deleted) is the OUTPUT surface, bounded by emission cardinality.
    */
  def emissionsFromFiles(spark: SparkSession, staged: DataFrame, chunks: Int,
      statePartitions: Int, prefix: String, outputMode: String,
      order: org.apache.spark.sql.Column*)(
      agg: DataFrame => DataFrame): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory(prefix).toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      FileStage.stage(staged, inDir, chunks, order: _*)
      val name = s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"
      try {
        val q = runWithStatePartitions(spark, statePartitions) {
          val stream = spark.readStream
            .schema(staged.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inDir)
          agg(stream)
            .writeStream.format("memory").queryName(name)
            .outputMode(outputMode)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        try q.awaitTermination() finally q.stop()
        val table = spark.table(name)
        spark.createDataFrame(
          java.util.Arrays.asList(table.collect(): _*), table.schema)
      } finally {
        try spark.catalog.dropTempView(name) catch { case _: Exception => () }
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
  }

  def updateModeEmissions[T](spark: SparkSession, rows: Seq[T], chunks: Int,
      statePartitions: Int, prefix: String)(agg: Dataset[T] => DataFrame)(
      implicit enc: Encoder[T]): DataFrame = {
    implicit val ctx = spark.sqlContext
    val name = s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val input = MemoryStream[T]
    val q = runWithStatePartitions(spark, statePartitions) {
      agg(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    }
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
