package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.WinnowFingerprints
import graft.operators.Winnow
import graft.sources.Tables

/** Streaming passage-novelty filter — the incremental twin of
  * [[graft.operators.Winnow.sharedPassages]]'s index: each arriving
  * document explodes into its winnowing fingerprints INSIDE the streaming
  * query (narrow, stateless), and `dropDuplicatesWithinWatermark` keyed on
  * the 8-byte fingerprint keeps only first-seen passages. An arriving
  * document whose fingerprints ALL collide with state is entirely
  * known content — the ingest-time near-dup signal, at O(distinct
  * fingerprints per horizon) state (never document bodies; the winnowing
  * compression means ~2/(w+1) of the shingle count).
  *
  * Certified surface: the surviving fingerprint KEY SET (the same
  * key-set-only contract as [[StreamingDedup]], for the same reason —
  * which document first carries a fingerprint inside one micro-batch
  * depends on partition processing order).
  */
object StreamingWinnow {

  /** First-seen passage fingerprints of a document stream with event-time
    * column `ts` and text column `text`.
    */
  def novelPassages(docs: DataFrame, horizon: String): DataFrame =
    docs
      .select(col("ts"),
        explode(WinnowFingerprints(col("text"), Winnow.ShingleK, Winnow.WindowW)).as("fp"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Driver query: the documents table replayed through [[novelPassages]]
    * in ~`chunks` micro-batches; synthetic deterministic arrival times and
    * a full-span horizon (the [[StreamingDedup.exactWithinHorizon]]
    * configuration), so the survivor set equals the batch DISTINCT
    * fingerprint set and certifies against that oracle.
    *
    * The horizon is DERIVED from the replay's own time span (arrival times
    * are doc_id seconds after base, so max doc_id + slack covers every
    * arrival): a fixed horizon would silently start evicting state — and
    * re-admitting duplicate fingerprints — once a corpus grew past it,
    * diverging from the batch oracle (the StreamingSessions rule: the
    * certification harness sizes its watermark to the data, not a constant).
    */
  def firstSeenPassages(spark: SparkSession, dir: String, chunks: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
      .sortBy(_._1)
      .map { case (id, text) =>
        DocArrival(new java.sql.Timestamp(base + id * 1000L), id, text) }
    val horizon = s"${(if (rows.nonEmpty) rows.last.doc_id else 0L) + 3600L} seconds"
    val name = s"winnow_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val input = MemoryStream[DocArrival]
    val q = ReplayHarness.runWithStatePartitions(spark, 8) {
      novelPassages(input.toDF(), horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    }
    val fps = try {
      val per = math.max(1, (rows.length + chunks - 1) / chunks)
      rows.grouped(per).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      spark.table(name).select(col("fp")).as[Long].collect().toSeq
    } finally {
      q.stop()
      try spark.catalog.dropTempView(name) catch { case _: Exception => () }
    }
    fps.toDF("fp").orderBy(col("fp"))
  }

  /** The driver-free form: the same in-stream fingerprint explosion and
    * first-seen state over distributed file-source micro-batches
    * ([[ReplayHarness.emissionsFromFiles]], append mode — first-seen
    * fingerprints emit on arrival, no flush sentinel needed) with the same
    * span-derived horizon (the only driver-visible scalar is max(doc_id)).
    * SAME oracle as the MemoryStream twin: the surviving fingerprint set.
    */
  def firstSeenPassagesFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val maxId = Option(docs.agg(max(col("doc_id").cast("long"))).head()
      .getAs[java.lang.Long](0)).map(_.toLong).getOrElse(0L) // empty corpus
    val horizon = s"${maxId + 3600} seconds"
    ReplayHarness.emissionsFromFiles(
      spark, StreamingDedup.arrivalsFrame(docs), chunks, statePartitions = 8,
      prefix = "winnow_file", outputMode = "append",
      col("ts"), col("doc_id"))(
      novelPassages(_, horizon))
      .select(col("fp")).orderBy(col("fp"))
  }
}
