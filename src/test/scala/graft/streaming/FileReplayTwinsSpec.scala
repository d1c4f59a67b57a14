package graft.streaming

import graft.SparkSpec
import graft.operators.{HeavyHitters, Relational}

/** The round-13 file-source twins: merging-window sessionization and the
  * update-mode heavy-hitter counters certified with NO driver-side input
  * materialization, against their batch forms (the driver re-certifies the
  * same equalities against the DuckDB oracles at sf0.01).
  */
class FileReplayTwinsSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("file-source sessionization equals batch session_window, incl. " +
      "trailing sessions flushed by the sentinels") {
    val batch = rows(Relational.sessionWindows(spark, sf0001)
      .withColumn("session_start",
        org.apache.spark.sql.functions.col("session_start").cast("timestamp_ntz"))
      .withColumn("session_end",
        org.apache.spark.sql.functions.col("session_end").cast("timestamp_ntz")))
    assert(batch.nonEmpty)
    val streamed = rows(FileReplaySessions.userSessions(spark, sf0001))
    assert(streamed == batch)
  }

  test("sessionization state carries across finer file-batches (chunks=7)") {
    val batch = rows(Relational.sessionWindows(spark, sf0001)
      .withColumn("session_start",
        org.apache.spark.sql.functions.col("session_start").cast("timestamp_ntz"))
      .withColumn("session_end",
        org.apache.spark.sql.functions.col("session_end").cast("timestamp_ntz")))
    val streamed = rows(FileReplaySessions.userSessions(spark, sf0001, chunks = 7))
    assert(streamed == batch)
  }

  test("file-source update-mode counters rank the same heavy hitters as " +
      "the batch aggregate") {
    val batch = rows(HeavyHitters.hotCustomers(spark, sf0001))
    assert(batch.nonEmpty)
    val streamed = rows(FileReplayHeavyHitters.hotCustomers(spark, sf0001))
    assert(streamed == batch)
    // order-free: a different chunking folds to the same counters
    val rechunked = rows(FileReplayHeavyHitters.hotCustomers(spark, sf0001, chunks = 5))
    assert(rechunked == batch)
  }
}
