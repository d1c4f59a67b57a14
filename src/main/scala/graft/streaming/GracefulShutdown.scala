package graft.streaming

import org.apache.spark.sql.SparkSession

/** Graceful shutdown for streaming queries (SURVEY §2.7 ST8).
  *
  * The reference installs a SIGINT/SIGTERM handler that logs and exits 0
  * (/root/reference/mqtt2sql.py:926-963). The Spark equivalent: a JVM
  * shutdown hook (the JVM's signal seam) that calls `StreamingQuery.stop()`
  * on every active query. NOTE: `stop()` interrupts the stream thread and
  * may ABORT the in-flight micro-batch mid-run — it does not wait for its
  * commit. The no-duplicate/no-loss guarantee comes from restart-from-
  * checkpoint (the aborted batch's offsets were never committed, so it is
  * simply re-executed) plus sink idempotence (keyed merge / dedupable
  * appends), NOT from shutdown atomicity — a non-idempotent sink can
  * observe partial effects of the aborted batch. StreamingCdcSpec's
  * restart test asserts the recovery property.
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
