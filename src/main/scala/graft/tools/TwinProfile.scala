package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-micro-batch profiler for the streaming file twins (not driver
  * contract): runs selected eager queries with a StreamingQueryListener that
  * prints each batch's durationMs breakdown (queryPlanning, getBatch,
  * addBatch, walCommit, commitOffsets, stateCommit...), so the twin fixed
  * cost attributes to planning vs state-commit vs sink work. Used by the
  * round-21 optimization pass to decide where the ~0.6-1 s/batch overhead
  * actually lives before changing anything.
  */
object TwinProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("pipeline_clean_corpus_streaming_file")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match the Bench session (see Bench.scala rationale)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    // experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" (profiling only)
    val builder = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foldLeft(builder0)((b, kv) => b.config(kv(0).trim, kv(1).trim))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[twin] stream started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs
        println(s"[twin] batch ${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durations=$d")
        val ss = e.progress.stateOperators
        if (ss.nonEmpty)
          println(s"[twin]   state: " + ss.map(s =>
            s"commitMs=${s.commitTimeMs} rowsUpdated=${s.numRowsUpdated}").mkString("; "))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    // per-query job/stage/task accounting: how much of a query's wall time
    // is scheduled task work vs driver-side gaps (planning, codegen,
    // broadcast builds)
    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val inputRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet()
        val si = e.stageInfo
        val dur = for (s <- si.submissionTime; c <- si.completionTime) yield c - s
        if (dur.exists(_ >= 200) && sys.env.contains("SPARK_GRAFT_STAGE_DETAIL"))
          println(s"[twin]   stage ${si.stageId} ${dur.getOrElse(-1L)}ms " +
            s"tasks=${si.numTasks} ${si.name.takeWhile(_ != '\n').take(120)}")
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet()
        if (e.taskInfo != null) taskTimeMs.addAndGet(e.taskInfo.duration)
        if (e.taskMetrics != null) {
          inputRecords.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
          shuffleRecords.addAndGet(e.taskMetrics.shuffleReadMetrics.recordsRead)
          cpuTimeMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
        }
      }
    })
    def resetCounts(): Unit = { stageCount.set(0); jobCount.set(0); taskCount.set(0)
      taskTimeMs.set(0); inputRecords.set(0); shuffleRecords.set(0); cpuTimeMs.set(0) }
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    var cgCount0 = 0L
    def printCounts(label: String): Unit = {
      val cgCount = cg.METRIC_COMPILATION_TIME.getCount
      println(s"[twin] $label jobs=${jobCount.get} stages=${stageCount.get} " +
        s"tasks=${taskCount.get} taskTimeSum=${taskTimeMs.get / 1000.0}s " +
        s"cpuSum=${cpuTimeMs.get / 1000.0}s inputRows=${inputRecords.get} " +
        s"shuffleRows=${shuffleRecords.get} codegenCompiles=${cgCount - cgCount0}")
      cgCount0 = cgCount
    }
    // session warmup (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries.get("q_distinct_users")
      .foreach(f => f(spark, dir).write.format("noop").mode("overwrite").save())
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { round =>
        spark.catalog.clearCache()
        System.gc()
        resetCounts()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[twin] $name round $round total ${(System.nanoTime() - t0) / 1e9}%.2f s")
        printCounts(s"$name round $round")
      }
    }
    spark.stop()
  }
}
