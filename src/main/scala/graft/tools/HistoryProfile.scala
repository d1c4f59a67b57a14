package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ContiguousId, MqttPipeline, MqttQueries}

/** Ad-hoc stage profiler for mqtt_history (not driver contract): attributes
  * the query's time across its stages under the same session settings as
  * graft.Bench, with repeated runs to separate steady-state from first-run
  * costs (JIT, parquet footers, broadcast build).
  */
object HistoryProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup parity w/ Bench
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[hist] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val m = MqttQueries.replayMessages(spark, dir)
    time("messages scan")(noop(m))
    time("historyKept (lag window)")(noop(MqttPipeline.historyKept(m)))
    time("kept + ContiguousId")(noop(
      ContiguousId.assign(MqttPipeline.historyKept(m), "id",
        Seq(col("ts"), col("msg_id")))))
    time("state dim (stateTable)")(noop(MqttPipeline.stateTable(m)))
    for (i <- 1 to 3)
      time(s"mqtt_history full (run $i)")(noop(MqttQueries.history(spark, dir)))
    spark.stop()
  }
}
