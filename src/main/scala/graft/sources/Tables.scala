package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (see /root/repo/TESTDATA.md)
  * plus the deterministic MQTT-message replay frame.
  *
  * The reference ingests a live MQTT stream of `(topic, payload, qos, retain)`
  * (see /root/reference/mqtt2sql.py:478-480,771-777). For deterministic offline
  * testing we replay `events.parquet` reshaped into that message schema:
  * topic   <- "tele/<event_type>/<user_id % 100>"   (an MQTT-ish topic path)
  * value   <- UTF-8 bytes of the JSON `props` column (opaque payload, the
  *            reference never parses it — mqtt2sql.py:586 hexes it into a BLOB)
  * ts      <- event ts (reference stamps receipt time, mqtt2sql.py:522; using
  *            input-data time keeps tests deterministic)
  * msg_id  <- event_id (stands in for arrival order, which the reference
  *            observes as ascending autoincrement ids, README.md:251)
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader refuses. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; the int64 nanos are then
    * converted here to a microsecond TimestampType with exact integer
    * arithmetic (`div`, never double division — epoch-nanos exceed 2^53).
    * DuckDB performs the identical ns->us truncation natively on read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP_NTZ: wall-clock semantics, matching how the other parquet
        // tables (isAdjustedToUTC=false) read and how DuckDB sees them
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The MQTT message replay frame: (msg_id, ts, topic, value, qos, retain).
    * `value` is BinaryType end-to-end, matching the reference's opaque LONGBLOB
    * payload (/root/reference/mysql.sql:46). Columns are projected straight off
    * the parquet scan so Catalyst prunes unused event columns.
    */
  def messages(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("msg_id"),
      col("ts"),
      concat(lit("tele/"), col("event_type"), lit("/"),
        (col("user_id") % 100).cast("string")).as("topic"),
      encode(col("props"), "UTF-8").as("value"),
      lit(0).as("qos"),
      lit(0).as("retain"))

  /** DuckDB-SQL fragment producing the identical message frame from `events`,
    * used as the CTE prefix of every parity oracle. Kept in one place so the
    * Spark reshape above and the oracle can never drift apart.
    */
  val messagesSql: String =
    """SELECT event_id AS msg_id, ts,
      |       'tele/' || event_type || '/' || CAST(user_id % 100 AS VARCHAR) AS topic,
      |       encode(props) AS value, 0 AS qos, 0 AS retain
      |FROM events""".stripMargin
}
