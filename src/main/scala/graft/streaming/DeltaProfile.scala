package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Caching, Dedup, DedupDelta}
import graft.sources.Tables

/** Ad-hoc attribution for `dedup_minhash_delta_streaming_file` (not driver
  * contract): times the staging write, the static-side freeze, and the
  * streamed probe separately, and prints per-micro-batch durations, so the
  * twin's cost decomposes into harness overhead vs probe work.
  */
object DeltaProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[delta] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val oldSets = Caching.cached(
      Dedup.hashedShingleSets(DedupDelta.oldAugmented(docs)))
    time("old sets cache")(oldSets.count())
    val frozen = Caching.cached(DedupDelta.frozenIndex(oldSets, Dedup.MaxBucket))
    time("frozen index cache")(frozen.count())
    val staged = Dedup.hashedShingleSets(DedupDelta.deltaDocs(docs))
      .withColumn("mh", Dedup.signatureOf(col("sh")))
    val work = java.nio.file.Files.createTempDirectory("delta_prof").toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      time("stage delta sets")(FileStage.stage(staged, inDir, 3, col("doc_id")))
      val oldSide = Caching.cached(oldSets.select(col("doc_id").as("old_id"),
        col("sh").as("__shb")))
      time("old side cache")(oldSide.count())
      val name = "delta_prof_sink"
      val q = ReplayHarness.runWithStatePartitions(spark, 4) {
        val stream = spark.readStream.schema(staged.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        stream
          .select(col("doc_id"), col("sh"),
            explode(Dedup.bandKeys(col("mh"))).as("bk"))
          .join(broadcast(frozen), Seq("bk"))
          .filter(col("doc_id") =!= col("old_id"))
          .join(oldSide, Seq("old_id"))
          .withColumn("common", size(array_intersect(col("sh"), col("__shb"))))
          .withColumn("jaccard",
            Dedup.jaccardOf(col("sh"), col("__shb"), col("common")))
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_id"), col("old_id"),
            round(col("jaccard"), 6).as("jaccard"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      time("stream (3 batches)")(q.awaitTermination())
      q.recentProgress.foreach { p =>
        println(s"[delta] batch ${p.batchId}: ${p.durationMs}")
      }
      time("readback")(println(
        s"[delta] rows=${spark.table(name).distinct().count()}"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
    spark.stop()
  }
}
