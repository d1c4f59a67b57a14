package graft.streaming

import org.apache.spark.sql.SparkSession

/** Ad-hoc phase profiler for the stream-stream join pair (not driver
  * contract): runs the two contract queries twice (cold + warm) with a
  * per-micro-batch progress listener, so replay cost attributes to staging
  * vs per-batch state/commit overhead. The r14 finding it exists to keep
  * honest: each micro-batch costs ~0.6-1 s of fixed overhead at sf0.1
  * (state-store commits + planning dominate; input rows are nearly free at
  * this scale), so the contract entries run the cheapest shape that still
  * exercises cross-batch join state — chunks=2, one flush sentinel, the
  * trailing no-data batch doing the final eviction.
  */
object SsjProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[ssj] batch ${e.progress.batchId}: rows=${e.progress.numInputRows} " +
          s"durationMs=${e.progress.durationMs}")
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ssj] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 2).foreach { round =>
      t(s"r$round inner")(
        println(s"[ssj] rows=${StreamStreamJoin.signupPurchases(spark, dir, chunks = 2).count()}"))
      t(s"r$round outer")(
        println(s"[ssj] rows=${StreamStreamJoin.signupPurchasesOuter(spark, dir, chunks = 2).count()}"))
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
