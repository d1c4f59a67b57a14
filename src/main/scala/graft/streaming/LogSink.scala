package graft.streaming

import java.io.{File, FileWriter}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** The log sink (SURVEY §2.1 S6), re-expressed for Spark's execution model.
  *
  * The reference logs every event through one `log(level, msg)` function
  * (/root/reference/mqtt2sql.py:391-407): messages at or below the configured
  * verbosity get a `%Y-%m-%d %H:%M:%S` timestamp prefix and go to stdout plus
  * an optional logfile whose FILENAME is strftime-templated per message
  * (mqtt2sql.py:403 — e.g. `mqtt.%Y-%m-%d.log` rotates daily), with levels
  * ALWAYS(0) < INFORMATION(1) < NOTICE(2) < ERROR(3) (mqtt2sql.py:368-375).
  *
  * In a Spark engine the events worth logging arrive through listener buses,
  * not inline callbacks, so the component is [[GraftLogger]] (format/gate/
  * route parity) plus two listeners feeding it:
  *
  *  - [[StreamingLogListener]]: per-micro-batch progress of every streaming
  *    query (the reference's per-message NOTICE lines, mqtt2sql.py:779,
  *    aggregated to the micro-batch grain that replaces per-message
  *    callbacks);
  *  - [[MetricsLogListener]]: every `observe()` metric of every completed
  *    batch query — this is where the LSH/dedup skew-cap drop counts
  *    surface outside tests, so capped (dropped) work is visible in
  *    operations, never silent.
  */
object LogLevel {
  val Always = 0
  val Information = 1
  val Notice = 2
  val Error = 3
}

/** Timestamped, level-gated logger with an optional strftime-templated
  * logfile — `log()` parity (mqtt2sql.py:391-407). The sink function
  * defaults to stdout; tests inject a buffer. `clock` is injectable so the
  * timestamp/rotation contract is testable deterministically.
  */
final class GraftLogger(
    verboseLevel: Int = LogLevel.Error,
    logfileTemplate: Option[String] = None,
    sink: String => Unit = println,
    clock: () => LocalDateTime = () => LocalDateTime.now()) {

  private val stampFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def log(level: Int, msg: String): Unit = if (verboseLevel >= level) {
    val now = clock()
    val line = s"${now.format(stampFmt)}: $msg"
    logfileTemplate.foreach { tpl =>
      val f = new File(GraftLogger.strftime(tpl, now))
      val w = new FileWriter(f, true)
      try w.write(line + "\n") finally w.close()
    }
    sink(line)
  }
}

object GraftLogger {
  /** Expand the strftime codes the logfile template contract needs
    * (mqtt2sql.py:403 `time.strftime(ARGS.logfile, ...)`); unknown codes
    * pass through literally, `%%` escapes.
    */
  def strftime(template: String, t: LocalDateTime): String = {
    val out = new StringBuilder
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '%' && i + 1 < template.length) {
        template.charAt(i + 1) match {
          case 'Y' => out.append(f"${t.getYear}%04d")
          case 'y' => out.append(f"${t.getYear % 100}%02d")
          case 'm' => out.append(f"${t.getMonthValue}%02d")
          case 'd' => out.append(f"${t.getDayOfMonth}%02d")
          case 'H' => out.append(f"${t.getHour}%02d")
          case 'M' => out.append(f"${t.getMinute}%02d")
          case 'S' => out.append(f"${t.getSecond}%02d")
          case 'j' => out.append(f"${t.getDayOfYear}%03d")
          case '%' => out.append('%')
          case other => out.append('%').append(other)
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

/** Per-micro-batch progress lines for every streaming query on the session. */
final class StreamingLogListener(logger: GraftLogger) extends StreamingQueryListener {
  import StreamingQueryListener._

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    logger.log(LogLevel.Information, s"stream ${e.name} [${e.id}] start")

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    logger.log(LogLevel.Notice,
      s"stream ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
        f"rps=${p.processedRowsPerSecond}%.1f dur=${p.durationMs}")
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    e.exception match {
      case Some(err) => logger.log(LogLevel.Error, s"stream [${e.id}] ERROR: $err")
      case None => logger.log(LogLevel.Information, s"stream [${e.id}] end")
    }
}

/** Logs every observe() metric of every completed query — the channel
  * through which the skew-cap drop counts (Dedup.capGroups and the LSH
  * bucket caps) reach operations instead of only test listeners.
  */
final class MetricsLogListener(logger: GraftLogger) extends QueryExecutionListener {
  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      val fields = row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => s"$f=${row.get(i)}" }.mkString(", ")
      logger.log(LogLevel.Notice, s"metrics $name: $fields")
    }

  override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
    logger.log(LogLevel.Error, s"query ERROR: ${error.getMessage}")
}

/** Install/uninstall both listeners on a session as one component. */
object LogSink {
  final case class Handle(streaming: StreamingLogListener, metrics: MetricsLogListener)

  def install(spark: SparkSession, logger: GraftLogger): Handle = {
    val h = Handle(new StreamingLogListener(logger), new MetricsLogListener(logger))
    spark.streams.addListener(h.streaming)
    spark.listenerManager.register(h.metrics)
    h
  }

  def uninstall(spark: SparkSession, h: Handle): Unit = {
    spark.streams.removeListener(h.streaming)
    spark.listenerManager.unregister(h.metrics)
  }
}
