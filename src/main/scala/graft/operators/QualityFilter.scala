package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Per-domain quality percentile gate (the FineWeb-style knob): keep the
  * top [[KeepPct]]% of documents WITHIN each source by quality score, ties
  * broken by doc_id — "drop the worst 70% of every domain" rather than a
  * global threshold that would empty low-quality domains entirely.
  *
  * Scale shape — the exact-percentile cutoff WITHOUT a per-source window
  * over the data: a `row_number() OVER (PARTITION BY source)` would drag
  * every row of a domain into one partition (a skew pathology at 100 TB
  * where one domain can be half the corpus). Instead: (1) one map-side-
  * combined aggregation to the per-(source, quality) HISTOGRAM (bounded by
  * |sources| × |distinct rounded scores|, data-independent); (2) per-source
  * admission counts and the boundary score derived on histogram rows with
  * a histogram-sized window; (3) the histogram broadcasts back — scores
  * strictly above the boundary are kept with NO ranking at all, and only
  * the boundary-score tie group (one score per source) ranks by doc_id,
  * a window whose partition is the tie group, not the domain.
  *
  * Exactness: admissions are integer (`n_s · pct div 100`, floored on both
  * engines); the quality score is the certified `text_quality` rounded
  * double, bit-identical cross-engine on the gate corpora, so grouping and
  * comparing on it is exact in the same certified scope (the equality the
  * whole quality family already relies on). Equivalent to
  * `row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
  * <= n_s*pct//100` — rn = (docs strictly above) + (rank within tie).
  */
object QualityFilter {

  /** Percent of each source kept, by quality rank. */
  val KeepPct = 30L

  /** (doc_id, source, quality): the per-source top-[[KeepPct]]% survivors. */
  def filter(docs: DataFrame): DataFrame =
    filterScored(docs.select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q")))

  /** The cutoff over an already-scored (doc_id, source, q) frame — the seam
    * the model-check spec drives with adversarial tie layouts.
    *
    * The scored frame has THREE consumers (the histogram and both kept
    * branches) — materialized once so the quality-scoring scan pass runs
    * once, not three times (the Assemble lesson).
    */
  private[operators] def filterScored(scoredIn: DataFrame): DataFrame = {
    val scored = Caching.cached(scoredIn)
    val hist = scored.groupBy(col("source"), col("q"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source")).orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ws = Window.partitionBy(col("source"))
    val flagged = hist
      .withColumn("cum_end", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(ws))
      .withColumn("admit", expr(s"(total * $KeepPct) div 100"))
      .withColumn("cum_start", col("cum_end") - col("cnt"))
      .filter(col("cum_start") < col("admit"))
      .select(col("source"), col("q"),
        (col("cum_end") <= col("admit")).as("full"),
        (col("admit") - col("cum_start")).as("need"))
    val joined = scored.join(broadcast(flagged), Seq("source", "q"))
    val fullKept = joined.filter(col("full"))
      .select(col("doc_id"), col("source"), col("q"))
    // the boundary tie group: ONE score per source ranks by doc_id — the
    // window partition is the tie group, never the domain
    val tieW = Window.partitionBy(col("source"), col("q")).orderBy(col("doc_id"))
    val boundaryKept = joined.filter(!col("full"))
      .withColumn("tie_rank", row_number().over(tieW))
      .filter(col("tie_rank") <= col("need"))
      .select(col("doc_id"), col("source"), col("q"))
    fullKept.unionAll(boundaryKept)
      .select(col("doc_id"), col("source"), col("q").as("quality"))
  }

  /** Driver query: the per-source quality-filtered documents table. */
  def filterDocuments(spark: SparkSession, dir: String): DataFrame =
    filter(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[QualityFilter]] — the plain windowed spelling the
  * histogram construction is provably equivalent to.
  */
object QualityFilterSql {

  val filterDocumentsSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    ${TextAnalysisSql.qualityScoreSql("text")} AS q
       |  FROM documents),
       |n AS (SELECT source, count(*) AS n_s FROM scored GROUP BY 1),
       |r AS (
       |  SELECT s.doc_id, s.source, s.q,
       |    row_number() OVER (PARTITION BY s.source ORDER BY s.q DESC, s.doc_id)
       |      AS rn,
       |    n.n_s
       |  FROM scored s JOIN n USING (source))
       |SELECT doc_id, source, q AS quality FROM r
       |WHERE rn <= n_s * ${QualityFilter.KeepPct} // 100
       |ORDER BY doc_id""".stripMargin
}
