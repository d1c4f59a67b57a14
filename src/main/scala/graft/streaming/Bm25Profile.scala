package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Caching}
import graft.sources.Tables

/** Ad-hoc attribution for `text_bm25_topk_streaming_file` (not driver
  * contract): times the index caches, the query-plan staging, the streamed
  * probe, and the readback separately, printing per-micro-batch durations.
  */
object Bm25Profile {
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
      println(f"[bm25] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val tf = Caching.cached(Bm25.postings(docs))
    time("tf cache")(tf.count())
    val doclen = Caching.cached(
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))
    time("doclen cache")(doclen.count())
    val stats = doclen.agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
    val staged = Bm25.queryTerms(tf, stats.select(col("n")))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("term"), col("df"), col("n"), col("total_len"))
    val work = java.nio.file.Files.createTempDirectory("bm25_prof").toFile
    try {
      val inDir = new java.io.File(work, "in").getAbsolutePath
      time("stage query plans")(FileStage.stage(staged, inDir, 3, col("query_id")))
      val tfProbe = Caching.cached(
        tf.join(broadcast(staged.select(col("term")).distinct()), Seq("term")))
      time("tfProbe cache")(tfProbe.count())
      val name = "bm25_prof_sink"
      val q = ReplayHarness.runWithStatePartitions(spark, 4) {
        val stream = spark.readStream.schema(staged.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        stream
          .join(broadcast(tfProbe), Seq("term"))
          .join(broadcast(doclen), Seq("doc_id"))
          .withColumn("contrib", Bm25.contribUnats)
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("contrib")).as("score_unats"),
            count(lit(1)).as("n_terms"))
          .writeStream.format("memory").queryName(name)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      time("stream (3 batches)")(q.awaitTermination())
      q.recentProgress.foreach { p =>
        println(s"[bm25] batch ${p.batchId}: ${p.durationMs}")
      }
      time("readback")(println(
        s"[bm25] rows=${spark.table(name).count()}"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(work)
    spark.stop()
  }
}
