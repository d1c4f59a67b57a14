package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus column profile — the data-quality report every ingest step
  * starts with: per metadata column, the row count, null count, exact
  * distinct count, and lexical min/max (rendered as strings so one
  * schema covers every column type). Catching a silently-null `source`
  * or a collapsed `lang` domain BEFORE a mixing/sampling stage consumes
  * it is the whole point.
  *
  * Profiled columns are the metadata columns only ([[Columns]]) — never
  * `text`: an exact distinct over the payload column is [[Dedup.exact]]'s
  * job, and dragging the full text through an Expand would dominate the
  * scan for no report value.
  *
  * Scale shape: ONE corpus pass over a 4-column scan. The multi
  * count-distinct plans as Spark's Expand (×|columns|+1 narrow rows into
  * one map-side-combined aggregate) — the standard exact-profile trade;
  * the sketch family (`q_approx_distinct`, `q_hll_distinct`) is the
  * at-scale alternative when ±2% suffices. The final unpivot is a
  * generator over ONE aggregated row.
  */
object CorpusProfile {

  /** The profiled metadata columns, in report order. */
  val Columns: Seq[String] = Seq("doc_id", "lang", "n_chars", "source")

  /** (column_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
  def profile(docs: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n") +: Columns.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(col(c)).as(s"c$i"),
        countDistinct(col(c)).as(s"d$i"),
        min(col(c)).cast("string").as(s"mn$i"),
        max(col(c)).cast("string").as(s"mx$i"))
    }
    val one = docs.select(Columns.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = Columns.zipWithIndex.map { case (c, i) =>
      s"'$c', n, n - c$i, d$i, mn$i, mx$i"
    }.mkString(", ")
    one.selectExpr(s"stack(${Columns.length}, $rows) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
      .orderBy(col("column_name"))
  }

  /** Driver query: the documents-table profile. */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.documents(spark, dir))
}

/** DuckDB oracle for [[CorpusProfile]] — same columns, same one-row
  * aggregate unpivoted, same string rendering of min/max.
  */
object CorpusProfileSql {

  val profileDocumentsSql: String = {
    val aggs = CorpusProfile.Columns.zipWithIndex.map { case (c, i) =>
      s"""count($c) AS c$i, count(DISTINCT $c) AS d$i,
         |    CAST(min($c) AS VARCHAR) AS mn$i,
         |    CAST(max($c) AS VARCHAR) AS mx$i""".stripMargin
    }.mkString(",\n    ")
    val branches = CorpusProfile.Columns.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS column_name, n AS n_rows, n - c$i AS n_nulls,
         |  d$i AS n_distinct, mn$i AS min_val, mx$i AS max_val FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT count(*) AS n,
       |    $aggs
       |  FROM documents)
       |$branches
       |ORDER BY column_name""".stripMargin
  }
}
