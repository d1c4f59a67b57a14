package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's keyed upsert sink (`INSERT ... ON DUPLICATE KEY UPDATE`,
  * /root/reference/mqtt2sql.py:579-629, PK=topic mysql.sql:51) as a
  * `foreachBatch` merge: each micro-batch is reduced to its last message per
  * topic, merged against the stored state, and the state store rewritten.
  *
  * This file-based implementation is the offline-testable stand-in; against a
  * transactional store the merge body becomes one `MERGE INTO` (Delta/Iceberg)
  * or JDBC upsert — the per-batch reduction and idempotence contract are
  * identical. Checkpointed micro-batches + an idempotent keyed merge give
  * effectively-exactly-once per key, a strict upgrade over the reference's
  * QoS-0 at-most-once (SURVEY §2.7 ST1).
  */
object UpsertSink {

  /** Merge one micro-batch into the keyed state at `statePath`.
    * Usage: `stream.writeStream.foreachBatch(UpsertSink.merge(spark, path) _)`.
    */
  def merge(statePath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("topic")).orderBy(col("ts").desc, col("msg_id").desc)
    val batchLast = batch
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val existing =
      try spark.read.parquet(statePath)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batchLast.schema) }
    val merged = existing.unionByName(batchLast)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    // rewrite via temp path: parquet has no transactional MERGE; real targets
    // (Delta, JDBC) replace this with an in-place upsert
    val tmp = statePath + s"_tmp_$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(statePath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
