package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's user-facing read surface as Spark SQL temp views
  * (SURVEY §2.1 S7 — DDL bootstrap, re-expressed for an engine whose "DDL"
  * is view registration): after `register`, a user who today runs
  * `SELECT * FROM mqtt_history_view WHERE topic = '...' ORDER BY id` against
  * MySQL/SQLite (/root/reference/README.md:230-251) runs the identical SQL
  * through `spark.sql` — Catalyst plans it with the same broadcast-join
  * physical shape as the DataFrame form.
  *
  * Views are lazy logical plans: registration costs nothing; every query
  * over them gets full pushdown/pruning into the parquet scan.
  */
object Views {

  val Names = Seq("mqtt_messages", "mqtt", "mqtt_history", "mqtt_history_view")

  /** Register the parity tables over the replay frame at `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    val m = MqttQueries.replayMessages(spark, dir)
    val state = MqttPipeline.stateTable(m)
    val history = MqttPipeline.history(m)
    m.createOrReplaceTempView("mqtt_messages")
    state.createOrReplaceTempView("mqtt")
    history.createOrReplaceTempView("mqtt_history")
    MqttPipeline.historyView(history, state)
      .createOrReplaceTempView("mqtt_history_view")
  }

  def drop(spark: SparkSession): Unit =
    Names.foreach(spark.catalog.dropTempView(_))
}
