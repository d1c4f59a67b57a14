package graft.operators

import graft.SparkSpec

/** The reference user's SQL read path through registered views: the README's
  * documented queries must run verbatim-shaped against `spark.sql`.
  */
class ViewsSpec extends SparkSpec {

  test("README read idioms run over the registered views and agree with the DataFrame form") {
    Views.register(spark, sf0001)
    try {
      // the canonical read (README.md:230-251): view rows in ascending id order
      val viaSql = spark.sql(
        "SELECT id, ts, ts_last, topic, hex(value) AS value_hex FROM mqtt_history_view ORDER BY id")
      val viaDf = MqttQueries.historyView(spark, sf0001)
      assert(viaSql.collect().map(_.toSeq).toSeq == viaDf.collect().map(_.toSeq).toSeq)
      // FK totality: every history row resolves through the view join
      val Array(h, v) = spark.sql(
        "SELECT (SELECT count(*) FROM mqtt_history), (SELECT count(*) FROM mqtt_history_view)")
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      assert(h == v && h > 0)
      // state is one row per distinct topic
      val Array(t, s) = spark.sql(
        "SELECT (SELECT count(DISTINCT topic) FROM mqtt_messages), (SELECT count(*) FROM mqtt)")
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      assert(t == s)
    } finally Views.drop(spark)
  }
}
