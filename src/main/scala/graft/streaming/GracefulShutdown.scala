package graft.streaming

import org.apache.spark.sql.SparkSession

/** Graceful shutdown for streaming queries (SURVEY §2.7 ST8).
  *
  * The reference installs a SIGINT/SIGTERM handler that logs and exits 0
  * (/root/reference/mqtt2sql.py:926-963). The Spark equivalent: a JVM
  * shutdown hook (the JVM's signal seam) that calls `StreamingQuery.stop()`
  * on every active query. `stop()` interrupts the trigger loop after the
  * in-flight micro-batch's checkpoint commit, so a later restart resumes
  * exactly after the last committed offset — no duplicated and no lost
  * history rows (asserted by StreamingCdcSpec's restart test; the
  * idempotent keyed sink absorbs the one possibly re-run batch).
  */
object GracefulShutdown {

  def install(spark: SparkSession): Thread = {
    val hook = new Thread(() => stopAll(spark), "graft-graceful-shutdown")
    Runtime.getRuntime.addShutdownHook(hook)
    hook
  }

  def uninstall(hook: Thread): Boolean =
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => false } // already shutting down

  /** Stop every active query, letting each finish its current batch. */
  def stopAll(spark: SparkSession): Unit =
    spark.streams.active.foreach { q =>
      try q.stop()
      catch { case _: Exception => () } // best-effort: shutdown must proceed
    }
}
