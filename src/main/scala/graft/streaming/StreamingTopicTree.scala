package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MqttQueries

/** Streaming twin of the `$SYS`-style topic-tree rollup
  * (`MqttQueries.topicTree`): the message replay arrives as file-source
  * micro-batches and the per-prefix live-topic tree refreshes as ingest
  * proceeds — the monitoring view a broker dashboard keeps warm.
  *
  * The incremental side aggregates per (level, prefix, TOPIC) — message
  * count + latest event time — because streaming aggregation cannot host
  * the batch form's `countDistinct(topic)` (no distinct aggregates on
  * streams) and because that finer grain IS the monotone state: counts
  * and maxes only grow, so the readback folds each key by max (the
  * [[StreamingCorpusDrift]] discipline, batch-order-independent) and a
  * batch tail collapses topics into the prefix rollup — `n_topics` is a
  * plain `count(*)` there since the fold leaves one row per topic.
  *
  * State: one (count, max) pair per live (level, prefix, topic) — the
  * topic domain times its depth, the size of the tree being reported,
  * independent of message volume.
  */
object StreamingTopicTree {

  /** Driver query: same rollup as `mqtt_topic_tree`, with the replay
    * consumed as `chunks` real file-source micro-batches.
    */
  def treeFromFiles(spark: SparkSession, dir: String,
      chunks: Int = 3): DataFrame = {
    val msgs = MqttQueries.replayMessages(spark, dir)
    val emissions = ReplayHarness.emissionsFromFiles(
      spark, msgs, chunks, statePartitions = 4,
      prefix = "ttree_file", outputMode = "update", col("msg_id")) { stream =>
      stream
        .select(col("topic"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          split(col("topic"), "/").as("__parts"))
        .select(col("topic"), col("us"), col("__parts"),
          explode(sequence(lit(1), size(col("__parts")))).as("level"))
        .select(col("topic"), col("us"),
          col("level").cast("long").as("level"),
          expr("array_join(slice(__parts, 1, level), '/')").as("prefix"))
        .groupBy(col("level"), col("prefix"), col("topic"))
        .agg(count(lit(1)).as("n"), max(col("us")).as("us_max"))
    }
    emissions
      .groupBy(col("level"), col("prefix"), col("topic"))
      .agg(max(col("n")).as("n"), max(col("us_max")).as("us_max"))
      .groupBy(col("level"), col("prefix"))
      .agg(sum(col("n")).as("n_msgs"), count(lit(1)).as("n_topics"),
        max(col("us_max")).as("last_us"))
      .orderBy(col("level"), col("prefix"))
  }
}
