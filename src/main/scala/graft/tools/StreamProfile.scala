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
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durTotal=${p.durationMs}")
      }
    })
    val t0 = System.nanoTime()
    val out = graft.streaming.StreamingHistory.history(spark, dir)
    out.write.format("noop").mode("overwrite").save()
    println(f"[stream] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    spark.stop()
  }
}
