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

  test("NULL rows are ignored (SQL-aggregate posture), even when the " +
      "group has fewer than k non-null rows") {
    // group a: 2 non-null rows + rows with NULL value / NULL id, k=3.
    // The window form (ORDER BY v DESC ranks NULLs last) would pad to k
    // with a NULL row; the aggregate returns ONLY the non-null pairs —
    // the documented divergence (TopKAgg scaladoc "Two documented...").
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", java.lang.Long.valueOf(7L), java.lang.Long.valueOf(1L)),
        org.apache.spark.sql.Row("a", java.lang.Long.valueOf(5L), java.lang.Long.valueOf(2L)),
        org.apache.spark.sql.Row("a", null, java.lang.Long.valueOf(3L)),
        org.apache.spark.sql.Row("a", java.lang.Long.valueOf(9L), null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    val got = rows.repartition(3)
      .groupBy("g")
      .agg(TopKAgg.agg(col("v"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.value"), col("col.id"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 7L, 1L), ("a", 5L, 2L))) // 2 rows, not padded to k
  }

  test("duplicate (value, id) pairs collapse set-wise (documented " +
      "divergence from the row-counting window form)") {
    // (5, 1) arrives twice: one buffer slot, so rank 2 is the NEXT distinct
    // pair — where row_number() would spend rank 2 on the duplicate row.
    val rows = Seq(("a", 5L, 1L), ("a", 5L, 1L), ("a", 3L, 2L), ("a", 1L, 3L))
    val got = aggForm(rows, 2, 4)
    assert(got == Seq(("a", 1, 1L, 5L), ("a", 2, 2L, 3L)))
    // and the window form disagrees exactly as documented: its rank 2 is
    // the duplicate (5, 1) row, pushing (3, 2) out of the top 2
    assert(windowForm(rows, 2) == Seq(("a", 1, 1L, 5L), ("a", 2, 1L, 5L)))
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

  test("deterministic k-per-group sample equals the window spelling and " +
      "is partition-invariant") {
    val expect = {
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      graft.sources.Tables.documents(spark, sf0001)
        .select(col("lang"), col("doc_id").cast("long").as("doc_id"),
          graft.functions.TextFunctions.hash60(
            concat(lit(BoundedTopK.KSampleSalt), col("doc_id").cast("string")))
            .as("h"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= BoundedTopK.SampleK)
        .select(col("lang"), col("rank"), col("doc_id"), col("h"))
        .orderBy(col("lang"), col("rank"))
        .collect().map(_.toSeq).toSeq
    }
    assert(expect.nonEmpty)
    val got = BoundedTopK.sampleDocsPerLang(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == expect)
  }

  test("non-literal or non-positive k fails at analysis time") {
    Seq(("a", 1L, 1L)).toDF("g", "v", "id").createOrReplaceTempView("tk_bad")
    intercept[Exception] {
      spark.sql("SELECT top_k_pairs(v, id, 0) FROM tk_bad GROUP BY g").collect()
    }
  }
}
