package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Whole-stage-codegen COMPILATION is part of the performance contract:
  * with `spark.sql.codegen.fallback=true` (the default) a Janino failure
  * only logs `ERROR CodeGenerator` and silently drops the stage to
  * interpreted execution — which is exactly how the round-15 lang-ID CASE
  * regression shipped (25 hashAgg compile failures in the suite log,
  * correct answers, interpreted hot path). This suite re-executes the
  * clean-chain gate family with fallback DISABLED, so a generated method
  * exceeding Janino's limit fails the suite instead of the throughput.
  *
  * The queries chosen are every driver query the round-15 judge found
  * falling back: the lang-ID pair and the five composites that embed the
  * langPredict+quality gate inside aggregates.
  */
class CodegenCompileSpec extends SparkSpec {

  private def withStrictCodegen[A](body: => A): A = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }

  private val gateQueries = Seq(
    "text_langid", "text_langid_margin", "pipeline_clean_corpus",
    "pipeline_quality_filter", "pipeline_curation_funnel",
    "pipeline_assemble", "pipeline_curate")

  test("the clean-chain gate family compiles under whole-stage codegen " +
      "(no Janino fallback)") {
    withStrictCodegen {
      gateQueries.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sf0001)
        val n = df.count()
        assert(n > 0, s"$name returned no rows under strict codegen")
      }
    }
  }

  test("the langPredict gate predicate compiles inside a hash aggregate") {
    // the round-15 failure shape: the combined lang+quality gate feeding
    // a hashAgg_doAggregate method — reproduced directly
    withStrictCodegen {
      val docs = graft.sources.Tables.documents(spark, sf0001)
      val gated = CleanCorpus.gatedDocs(docs)
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"), avg(col("quality")).as("q"))
      assert(gated.count() > 0)
    }
  }
}
