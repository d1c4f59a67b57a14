package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TopKAgg

/** Bounded top-k aggregate: exactness vs the window row_number form
  * (bounded-merge top-k ≡ sort top-k), partition invariance through forced
  * partial merges, tie pinning, and the SQL surface.
  */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(rows: Seq[(String, Long, Long)], k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    rows.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "rank", "id", "v")
      .orderBy("g", "rank")
      .as[(String, Int, Long, Long)].collect().toSeq
  }

  private def aggForm(rows: Seq[(String, Long, Long)], k: Int, parts: Int) =
    rows.toDF("g", "v", "id")
      .repartition(parts) // force multi-buffer merge paths
      .groupBy("g")
      .agg(TopKAgg.agg(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id"), col("col.value"))
      .orderBy("g", "rank")
      .as[(String, Int, Long, Long)].collect().toSeq

  test("agg top-k equals window top-k, including ties pinned by id") {
    // ties on v within groups; id is the disambiguator
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0L until 40L
    } yield (g, i % 7, g.hashCode.toLong * 100 + i)
    assert(aggForm(rows, 5, 8) == windowForm(rows, 5))
  }

  test("partition invariance: 1, 3, and 16 partitions agree") {
    val rows = (0L until 200L).map(i => ("g" + (i % 4), (i * 37) % 50, i))
    val expect = windowForm(rows, 3)
    for (p <- Seq(1, 3, 16)) assert(aggForm(rows, 3, p) == expect, s"parts=$p")
  }

  test("groups smaller than k return all rows in rank order") {
    val rows = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("b", 1L, 3L))
    assert(aggForm(rows, 10, 2) == windowForm(rows, 10))
  }

  test("SQL surface: top_k_pairs registered via extensions") {
    Seq(("a", 3L, 1L), ("a", 7L, 2L), ("a", 5L, 3L)).toDF("g", "v", "id")
      .createOrReplaceTempView("tk_in")
    val got = spark.sql(
      "SELECT g, top_k_pairs(v, id, 2) AS top FROM tk_in GROUP BY g")
      .selectExpr("g", "top[0].id", "top[1].id")
      .as[(String, Long, Long)].head()
    assert(got == (("a", 2L, 3L)))
  }

  test("non-literal or non-positive k fails at analysis time") {
    Seq(("a", 1L, 1L)).toDF("g", "v", "id").createOrReplaceTempView("tk_bad")
    intercept[Exception] {
      spark.sql("SELECT top_k_pairs(v, id, 0) FROM tk_bad GROUP BY g").collect()
    }
  }
}
