package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, TextSql => TS}
import graft.sources.Tables

/** C4/RefinedWeb-style cross-document boilerplate removal: token n-gram
  * windows that recur across many DISTINCT documents (navigation chrome,
  * license blurbs, templated headers) are struck from every document, and
  * the surviving tokens are reassembled IN ORDER — the corpus-level
  * complement of the per-document repetition screen ([[TextAnalysis]]'s
  * `text_repetition`), and the REWRITE cousin of the flag-only passage
  * dedup (`dedup_passage`): this one edits the text a trainer would
  * actually consume.
  *
  * Scale shape: grams build from the exploded token positions with four
  * `lead()`s over the per-document window — codegen'd, O(len) per doc,
  * and the doc-keyed exchange it costs is the SAME partitioning the
  * covered-position anti-join and reassembly reuse downstream. (The
  * array-lambda shingle helper is deliberately NOT used here: projection
  * collapse re-inlines the tokens `split` into every lambda element —
  * 5 re-evaluations per position made the first cut of this operator
  * O(len²) per document, 36.8 s at sf0.1 vs ~3 s for this form — the
  * RepetitionStats lesson again.) The gram document-frequency
  * aggregation is the one corpus-sized shuffle (map-side combined);
  * grams at df ≥ [[MinDocs]] are a tiny set (91 of 24.5k at sf0.001)
  * that BROADCASTS back, so marking covered windows costs no second
  * data-sized exchange.
  *
  * Exactness: counts and positions are integers; the reassembled string
  * is a deterministic space-join of the kept tokens in position order on
  * both engines.
  */
object Boilerplate {

  /** Window length of the struck n-grams. */
  val Gram = 5

  /** A gram is boilerplate when it appears in at least this many DISTINCT
    * documents.
    */
  val MinDocs = 3

  /** (doc_id, n_kept, n_stripped, text_stripped): every document, its
    * token counts after/removed, and the order-preserving rewrite (empty
    * string when fully struck). Documents shorter than [[Gram]] tokens
    * cannot carry a window and pass through whole (modulo whitespace
    * normalization — output text is always the single-space token join).
    */
  def strip(docs: DataFrame): DataFrame = {
    // cached (r21): the tokenized corpus feeds the gram chain and the
    // final length projection — the plan expansions of the tokenizer (the
    // operator's single most expensive expression) collapse to one
    // materialization
    val base = Caching.cached(
      docs.select(col("doc_id"), TF.tokens(col("text")).as("__t")))
    val toks = base.select(col("doc_id"), posexplode(col("__t")))
      .select(col("doc_id"), col("pos"), col("col").as("token"))
    val wdoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until Gram).map(k => lead(col("token"), k).over(wdoc))
    // cached (r21): the windowed gram build (a doc-keyed exchange + four
    // leads) feeds both the document-frequency aggregation and the
    // coverage marking — one window pass instead of two. Rows PAST the
    // last gram start (null tail) stay in the frame carrying a null gram
    // so the coverage window below sees every position.
    val grams = Caching.cached(toks
      .withColumn("gram", when(leads.last.isNotNull,
        concat_ws(" ", col("token") +: leads: _*))))
    val frequent = grams.filter(col("gram").isNotNull)
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= MinDocs)
      .select(col("gram"))
    // Coverage as a second window over the SAME doc-keyed sort (r22):
    // position p is struck iff some frequent gram STARTS in
    // [p - Gram + 1, p] — a running max of the start flag over the
    // trailing Gram-1 rows (positions are dense per doc, so ROWS frame =
    // position frame). This replaces the r20/r21
    // explode(sequence)->distinct->anti-join spelling: the covered-set
    // exchange, the distinct aggregation and the (corpus x corpus)
    // anti-join disappear from the plan, and the only join touching a
    // corpus-sized side that remains is the broadcast of the tiny
    // df-filtered gram set (frequent) — scale-shape-identical, three
    // fewer corpus-keyed operators.
    val flagged = grams
      .join(broadcast(frequent.withColumn("__f", lit(true))),
        Seq("gram"), "left")
      .withColumn("__cov", max(when(col("__f"), 1).otherwise(0))
        .over(wdoc.rowsBetween(-(Gram - 1), 0)))
    // conditional reassembly over ALL positions: every tokenized doc
    // appears (fully-struck docs keep n_kept = 0), so the final join only
    // backfills zero-token documents
    val rebuilt = flagged.groupBy(col("doc_id"))
      .agg(sum(when(col("__cov") === 0, 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls the `when` leaves on struck rows
        array_join(transform(
          array_sort(collect_list(when(col("__cov") === 0,
            struct(col("pos"), col("token"))))),
          x => x.getField("token")), " ").as("text_stripped"))
    base.select(col("doc_id"), size(col("__t")).cast("long").as("__n"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_stripped"),
        coalesce(col("text_stripped"), lit("")).as("text_stripped"))
  }

  /** Driver query: the stripped documents table. */
  def stripDocuments(spark: SparkSession, dir: String): DataFrame =
    strip(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}

/** DuckDB oracle for [[Boilerplate]] — same tokenization, same 0-based
  * shingle start positions (multiple `unnest`s of equal-length lists zip
  * positionally), same df floor, same ordered reassembly.
  */
object BoilerplateSql {
  import Boilerplate.{Gram, MinDocs}

  /** The reusable CTE chain: ends with
    * `stripped(doc_id, n_kept, n_total, text_stripped)` — composites
    * ([[CurateSql]]) chain their stages after it.
    */
  val strippedCtes: String =
    s"""toks AS (SELECT doc_id, ${TS.tokens("text")} AS __t FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(range(len(__t) - ${Gram - 1})) AS pos0,
       |    unnest(${TS.shingles("text", Gram)}) AS gram
       |  FROM toks WHERE len(__t) >= $Gram),
       |frequent AS (
       |  SELECT gram FROM grams GROUP BY 1
       |  HAVING count(DISTINCT doc_id) >= $MinDocs),
       |covered AS (
       |  SELECT DISTINCT g.doc_id, g.pos0 + k.k AS pos
       |  FROM grams g JOIN frequent USING (gram)
       |  CROSS JOIN (SELECT unnest(range($Gram)) AS k) k),
       |tok AS (
       |  SELECT doc_id, unnest(range(len(__t))) AS pos, unnest(__t) AS token
       |  FROM toks),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.token FROM tok t
       |  ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos),
       |rebuilt AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(token, ' ' ORDER BY pos) AS text_stripped
       |  FROM kept GROUP BY 1),
       |stripped AS (
       |  SELECT t.doc_id,
       |    CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       |    CAST(len(t.__t) AS BIGINT) AS n_total,
       |    coalesce(r.text_stripped, '') AS text_stripped
       |  FROM toks t LEFT JOIN rebuilt r USING (doc_id))""".stripMargin

  val stripDocumentsSql: String =
    s"""WITH $strippedCtes
       |SELECT doc_id, n_kept, n_total - n_kept AS n_stripped, text_stripped
       |FROM stripped ORDER BY doc_id""".stripMargin
}
