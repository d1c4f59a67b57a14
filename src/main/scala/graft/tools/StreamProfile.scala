package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler for the streaming history query (not driver contract):
  * prints per-micro-batch progress so harness overhead is attributable.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the S6 log sink carries per-batch progress + observe() metrics
    graft.streaming.LogSink.install(spark, new graft.streaming.GraftLogger(
      verboseLevel = graft.streaming.LogLevel.Notice,
      sink = l => println(s"[stream] $l")))
    val t0 = System.nanoTime()
    val out = graft.streaming.StreamingHistory.history(spark, dir)
    out.write.format("noop").mode("overwrite").save()
    println(f"[stream] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    spark.stop()
  }
}
