package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Measure with the noop sink: every column materializes and top-level
    // sorts execute, unlike count() where Catalyst prunes computed columns
    // and eliminates the sort under the count aggregate (a narrow query
    // would otherwise time a parquet row-count, not the operator).
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM/codegen warmup so the first measured query doesn't absorb JIT and
    // parquet-footer costs (we measure the engine, not class loading)
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q_distinct_users").foreach(f => run(f(spark, sfDir)))
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must not masquerade as a fast one — record it
      try run(fn(spark, sfDir)) catch { case e: Throwable => errors += s"$name: ${e.getClass.getSimpleName}" }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
