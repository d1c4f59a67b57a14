package graft.streaming

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** S6 log sink: format/gating/rotation parity of the logger, and the two
  * listeners carrying streaming progress and observe() cap metrics into it
  * (reference log(): mqtt2sql.py:391-407; levels :368-375).
  */
class LogSinkSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = LocalDateTime.of(2026, 8, 12, 9, 30, 5)

  test("messages gate on level and carry the timestamp prefix") {
    val lines = ArrayBuffer.empty[String]
    val log = new GraftLogger(verboseLevel = LogLevel.Notice,
      sink = lines += _, clock = () => t0)
    log.log(LogLevel.Error, "too detailed for this verbosity") // 3 > 2: gated
    log.log(LogLevel.Notice, "shown")
    log.log(LogLevel.Always, "always shown")
    assert(lines.toSeq == Seq(
      "2026-08-12 09:30:05: shown",
      "2026-08-12 09:30:05: always shown"))
  }

  test("logfile name is strftime-templated per message (daily rotation) and appended") {
    val dir = Files.createTempDirectory("logsink").toString
    val tpl = s"$dir/graft.%Y-%m-%d.log"
    val lines = ArrayBuffer.empty[String]
    var now = t0
    val log = new GraftLogger(verboseLevel = LogLevel.Error,
      logfileTemplate = Some(tpl), sink = lines += _, clock = () => now)
    log.log(LogLevel.Notice, "day one, line one")
    log.log(LogLevel.Notice, "day one, line two")
    now = t0.plusDays(1) // the date rolls -> a NEW file, old one untouched
    log.log(LogLevel.Notice, "day two")
    val day1 = Files.readAllLines(Paths.get(s"$dir/graft.2026-08-12.log"))
    val day2 = Files.readAllLines(Paths.get(s"$dir/graft.2026-08-13.log"))
    assert(day1.size == 2 && day1.get(0).endsWith("day one, line one"))
    assert(day2.size == 1 && day2.get(0) == "2026-08-13 09:30:05: day two")
  }

  test("strftime expansion covers the template codes; %% escapes; unknown passes through") {
    assert(GraftLogger.strftime("%Y-%m-%d %H:%M:%S j=%j 100%% %q", t0) ==
      "2026-08-12 09:30:05 j=224 100% %q")
  }

  test("observe() cap metrics reach the log on a capped dedup run") {
    val lines = ArrayBuffer.empty[String]
    val handle = LogSink.install(spark,
      new GraftLogger(verboseLevel = LogLevel.Notice,
        sink = l => lines.synchronized { lines += l }))
    try {
      // the DedupSpec mega-bucket: 80 identical docs blow the band-bucket
      // cap in every band; the genuine near-dup pair still surfaces
      val base = (0 until 30).map(i => s"w$i").mkString(" ")
      val changed = ((0 until 29).map(i => s"w$i") :+ "x29").mkString(" ")
      val cloneText = (0 until 30).map(i => s"k$i").mkString(" ")
      val rows = (0L until 80L).map(i => (i, cloneText)) ++
        Seq((100L, base), (101L, changed))
      val out = Dedup.minhashLsh(rows.toDF("doc_id", "text")).collect()
      assert(out.length == 1)
      // listener delivery is async — poll with a deadline
      val deadline = System.currentTimeMillis() + 10000
      def capLine = lines.synchronized {
        lines.find(l => l.contains("metrics minhash_lsh_caps"))
      }
      while (capLine.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val line = capLine.getOrElse(fail(s"no cap metric logged; got: $lines"))
      assert(line.contains(s"=${80L * Dedup.Bands}")) // the drop count, visible
    } finally LogSink.uninstall(spark, handle)
  }

  test("streaming progress lines flow per micro-batch") {
    implicit val ctx = spark.sqlContext
    val lines = ArrayBuffer.empty[String]
    val handle = LogSink.install(spark,
      new GraftLogger(verboseLevel = LogLevel.Notice,
        sink = l => lines.synchronized { lines += l }))
    try {
      val input = MemoryStream[Long]
      val q = input.toDF().writeStream.format("memory")
        .queryName("logsink_stream").outputMode("append").start()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      q.stop()
      val deadline = System.currentTimeMillis() + 10000
      def batchLine = lines.synchronized {
        lines.find(l => l.contains("batch=0") && l.contains("rows=3"))
      }
      while (batchLine.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(batchLine.isDefined, s"no progress line; got: $lines")
    } finally LogSink.uninstall(spark, handle)
  }
}
