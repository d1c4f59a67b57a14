package graft.streaming

import graft.SparkSpec
import graft.operators.MqttQueries

/** The file-source streaming CDC path: incremental-equals-batch with NO
  * driver-side input materialization (the ingest is a distributed
  * range-ordered parquet write consumed by the file stream source, one
  * file per micro-batch).
  */
class FileReplayHistorySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }.toSeq).toSeq

  test("file-source micro-batch replay equals the batch lag-window history") {
    val batch = rows(MqttQueries.history(spark, sf0001))
    assert(batch.nonEmpty)
    val streamed = rows(FileReplayHistory.history(spark, sf0001))
    assert(streamed == batch)
  }

  test("state carries across many file-batches (finer chunking, same result)") {
    val batch = rows(MqttQueries.history(spark, sf0001))
    val streamed = rows(FileReplayHistory.history(spark, sf0001, chunks = 7))
    assert(streamed == batch)
  }
}
