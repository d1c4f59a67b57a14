package graft.streaming

import graft.SparkSpec
import graft.operators.MqttQueries

/** The file-source keyed-upsert path: micro-batch merge convergence with NO
  * driver-side input materialization, and batch-split invariance (the
  * lastPerKey winner rule is commutative/associative, so ANY chunking must
  * converge to the batch state).
  */
class FileReplayStateSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }.toSeq).toSeq

  test("file-source micro-batch upsert converges to the batch state table") {
    val batch = rows(MqttQueries.state(spark, sf0001))
    assert(batch.nonEmpty)
    val streamed = rows(FileReplayState.state(spark, sf0001))
    assert(streamed == batch)
  }

  test("convergence is batch-split invariant (finer chunking, same state)") {
    val batch = rows(MqttQueries.state(spark, sf0001))
    val streamed = rows(FileReplayState.state(spark, sf0001, chunks = 6))
    assert(streamed == batch)
  }
}
